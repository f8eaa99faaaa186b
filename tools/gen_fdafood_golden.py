#!/usr/bin/env python3
"""Generate the FDA-food-fallback reference golden.

Runs the REAL reference pair `load_fda_food_lookup` +
`check_fda_food_fallback` (`runners.py:1428-1495`) over a synthetic
registry CSV and a text corpus covering every branch: whole-text direct
hit (brand + product), >=4-char token partial hit, first-matching-token
ordering, short-token non-hit, cross-row key collision (dict build is
last-write-wins), same-row brand==product collision (product assignment
follows brand), "-" placeholder filtering, and plain misses. Output is
one CSV consumed by FdaFoodGoldenSpec.
"""
import csv
import importlib.util
import os
import sys
import tempfile
import types
from pathlib import Path

BASE = Path("/root/reference/pipelines/drugs/scripts")
OUT = Path(__file__).resolve().parent.parent / "src/test/resources/graft/fdafood"
OUT.mkdir(parents=True, exist_ok=True)
os.environ["PIPELINE_OUTPUTS_DIR"] = str(OUT)

# runners imports the tagger chain; satisfy it the same way the other
# generators do (rapidfuzz shim not needed on this code path, but the
# module imports must resolve)
def _ratio(a, b, **kw):
    return 0.0


rf = types.ModuleType("rapidfuzz")
rf.fuzz = types.SimpleNamespace(ratio=_ratio)
rf.process = types.SimpleNamespace(extract=lambda *a, **k: [])
sys.modules["rapidfuzz"] = rf

PKG = "refscriptsfood"
pkg = types.ModuleType(PKG)
pkg.__path__ = [str(BASE)]
sys.modules[PKG] = pkg


def load(name):
    spec = importlib.util.spec_from_file_location(f"{PKG}.{name}", BASE / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{PKG}.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


for m in ["unified_constants", "form_route_mapping", "tokenizer", "scoring",
          "lookup", "spinner", "io_utils", "tagger"]:
    load(m)
runners = load("runners")

# registry fixture: row order matters (dict build is last-write-wins)
FOOD = [
    # brand_name, product_name, registration_number
    ("ENSURE", "Ensure Gold Powder", "FR-001"),
    ("-", "Pedialyte Solution", "FR-002"),
    ("SUSTAGEN", "-", "FR-003"),
    # same-row collision: brand == product -> product assignment wins
    ("NUTREN", "nutren", "FR-004"),
    # cross-row collision on ENSURE: this later brand row overwrites the
    # row-0 brand entry
    ("ENSURE", "Ensure Plus Advance", "FR-005"),
    # cross-row collision where a later PRODUCT overwrites an earlier brand
    ("GLUCERNA", "-", "FR-006"),
    ("-", "Glucerna", "FR-007"),
    ("BEAR BRAND", "Bear Brand Fortified Milk", "FR-008"),
]

TEXTS = [
    (1, "ENSURE"),                          # direct brand hit (last write)
    (2, "ensure gold powder"),              # direct product hit, case-folded
    (3, "SUSTAGEN CHOCOLATE 1KG"),          # token partial via brand
    (4, "PEDIALYTE SOLUTION 500ML"),        # two-token key: no single-token hit
    (5, "UNKNOWN ITEM 123"),                # miss
    (6, "ENS 250"),                         # short token never probes
    (7, "NUTREN"),                          # same-row collision -> product
    (8, "GLUCERNA"),                        # cross-row: product overwrote brand
    (9, "CHOCOLATE SUSTAGEN DRINK"),        # first >=4 token CHOCOLATE misses,
                                            # second token SUSTAGEN hits
    (10, ""),                               # empty text -> (None, None)
    (11, "MILO BEAR BRAND PACK"),           # multi-token: BEAR(4) misses (key
                                            # is two-word), BRAND misses, MILO hits nothing
    (12, "Glucerna"),                       # direct, mixed case
    (13, "PATIENT GIVEN ENSURE SUPPLEMENT"),  # token partial via brand
]

import pandas as pd  # noqa: E402

with tempfile.TemporaryDirectory() as td:
    food_df = pd.DataFrame(FOOD, columns=["brand_name", "product_name",
                                          "registration_number"])
    food_path = Path(td) / "fda_food_2025-01-01.csv"
    food_df.to_csv(food_path, index=False)
    lookup = runners.load_fda_food_lookup(inputs_dir=Path(td))

rows = []
for tid, text in TEXTS:
    mtype, reg = runners.check_fda_food_fallback(text, lookup)
    rows.append((tid, text, mtype or "", reg or ""))

with open(OUT / "food_golden.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["id", "text", "food_match_type", "food_registration"])
    w.writerows(rows)

with open(OUT / "food_registry.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["row_order", "brand_name", "product_name", "registration_number"])
    for i, (b, p, r) in enumerate(FOOD):
        w.writerow([i, b, p, r])

print(f"wrote {len(rows)} golden rows to {OUT}")
for r in rows:
    print(r)
