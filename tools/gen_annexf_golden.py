#!/usr/bin/env python3
"""Generate the Annex-F (Part 2) runner-level reference golden.

The tagging core (tag_descriptions) is pinned cell-for-cell by the e2e
golden; what `run_annex_f_tagging` ADDS is the runner surface: the
positional row_idx merge of tagger results back into the annex frame
(annex rows keep their identity even with duplicate Drug Codes), the
matched_* column renames, the reorder_columns_after placement of
matched_reference_text, and passthrough of arbitrary extra annex columns.
This generator drives the REAL `runners.run_annex_f_tagging` over the e2e
catalog and pins its merged output as the golden for AnnexFTaggingSpec.
"""
import csv
import importlib.util
import os
import shutil
import sys
import types
from pathlib import Path

BASE = Path("/root/reference/pipelines/drugs/scripts")
E2E = Path(__file__).resolve().parent.parent / "src/test/resources/graft/e2e"
OUT = Path(__file__).resolve().parent.parent / "src/test/resources/graft/annexf"
OUT.mkdir(parents=True, exist_ok=True)

# runners.py reads these at import time; the tagger inside
# run_annex_f_tagging loads the unified_*.csv catalog from OUTPUTS_DIR
os.environ["PIPELINE_OUTPUTS_DIR"] = str(OUT)
os.environ["PIPELINE_INPUTS_DIR"] = str(OUT)
os.environ["PIPELINE_RAW_DIR"] = str(OUT)

UNIFIED = ["unified_generics.csv", "unified_atc.csv", "unified_brands.csv",
           "unified_synonyms.csv", "unified_mixtures.csv"]
for f in UNIFIED:
    shutil.copy(E2E / f, OUT / f)


# rapidfuzz shim (published indel-ratio formula; see gen_e2e_golden.py)
def _lcs(a, b):
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ai = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = prev[j - 1] + 1 if ai == b[j - 1] else max(prev[j], cur[j - 1])
        prev = cur
    return prev[lb]


def _ratio(a, b, **kw):
    if a is None or b is None:
        return 0.0
    ls = len(a) + len(b)
    if ls == 0:
        return 100.0
    return 100.0 * (1.0 - (ls - 2 * _lcs(a, b)) / ls)


def _extract(query, choices, scorer=None, limit=5, score_cutoff=0, **kw):
    scorer = scorer or _ratio
    scored = [(c, scorer(query, c), i) for i, c in enumerate(choices)]
    scored = [t for t in scored if t[1] >= score_cutoff]
    scored.sort(key=lambda t: (-t[1], t[2]))
    return scored[: limit if limit else len(scored)]


rf = types.ModuleType("rapidfuzz")
rf.fuzz = types.SimpleNamespace(ratio=_ratio)
rf.process = types.SimpleNamespace(extract=_extract)
sys.modules["rapidfuzz"] = rf

PKG = "refscriptsannex"
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

import pandas as pd  # noqa: E402

# ---- annex frame: duplicate Drug Codes (merge is positional, NOT by
# code), an unnamed-style extra column and a numeric passthrough column
ANNEX = [
    # drug_code, description, unit, price
    ("D0001", "PARACETAMOL 500MG TABLET", "tab", "1.50"),
    ("D0001", "PARACETAMOL 250MG/5ML SYRUP 60ML", "bottle", "38.00"),
    ("D0002", "AMOXICILLIN 500MG CAPSULE", "cap", "8.25"),
    ("D0003", "AMOXICILIN 500MG CAP", "cap", "7.90"),
    ("D0004", "CO-AMOXICLAV 625MG TABLET", "tab", "32.00"),
    ("D0005", "AMOXICILLIN 500MG + CLAVULANIC ACID 125MG TABLET", "tab", "30.10"),
    ("D0006", "VENTOLIN NEBULE 1MG/ML 2.5ML", "neb", "19.75"),
    ("D0007", "SALBUTAMOL 2.5MG/2.5ML NEBULE", "neb", "18.00"),
    ("D0008", "METFORMIN HCL 500MG TAB", "tab", "2.10"),
    ("D0009", "GLUCOPHAGE 500MG TABLET", "tab", "9.90"),
    ("D0010", "LOSARTAN POTASSIUM 100MG TABLET", "tab", "5.60"),
    ("D0011", "AMLODIPINE BESILATE 10MG TABLET", "tab", "4.20"),
    ("D0012", "ISOSORBIDE DINITRATE 5MG SUBLINGUAL TABLET", "tab", "6.30"),
    ("D0013", "ASPIRIN 100MG EC TABLET", "tab", "1.10"),
    ("D0014", "ASA 80MG TABLET", "tab", "0.95"),
    ("D0015", "OMEPRAZOLE 40MG IV VIAL", "vial", "120.00"),
    ("D0016", "PANTOPRAZOLE 40MG TABLET", "tab", "11.00"),
    ("D0017", "CLARITHROMYCIN 500MG ER TABLET", "tab", "28.40"),
    ("D0018", "CETIRIZINE 10MG/ML ORAL DROPS", "bottle", "45.00"),
    ("D0019", "MAGNESIUM SULFATE 250MG/ML VIAL", "vial", "22.20"),
    ("D0020", "MAGNESIUM SULFATE 2G IN 50ML NSS", "bag", "75.00"),
    ("D0021", "PARACETAMOL 300MG IN 100ML NSS INFUSION", "bag", "88.00"),
    ("D0022", "D5W 500ML", "bottle", "42.00"),
    ("D0023", "SODIUM CHLORIDE 0.9% 1L BOTTLE", "bottle", "55.00"),
    ("D0024", "LAMIVUDINE + ZIDOVUDINE 150MG/300MG TABLET", "tab", "60.00"),
    ("D0025", "BUDESONIDE + FORMOTEROL 160/4.5MCG INHALER", "inh", "450.00"),
    ("D0026", "INFLUENZA VACCINE 0.5ML PREFILLED SYRINGE", "syr", "380.00"),
    ("D0027", "DTP VACCINE 0.5ML AMPULE", "amp", "95.00"),
    ("D0028", "BENZYLPENICILLIN 1000000 IU VIAL", "vial", "33.00"),
    ("D0029", "PENICILLIN G 1000000 IU VIAL", "vial", "31.00"),
    ("D0030", "FERROUS SULFATE 325MG TABLET", "tab", "0.80"),
    ("D0031", "ASCORBIC ACID (VITAMIN C) 500MG TABLET", "tab", "1.20"),
    ("D0032", "GENTAMICIN 80MG/2ML VIAL", "vial", "14.60"),
    ("D0033", "GUAIFENESIN 100MG/5ML SYRUP 60ML", "bottle", "41.00"),
    ("D0034", "EPINEPHRINE 1MG/ML AMPULE", "amp", "25.00"),
    ("D0035", "PETHIDINE 50MG AMPULE", "amp", "52.00"),
    ("D0036", "GLUCOSE + NSS 1L BOTTLE", "bottle", "70.00"),
    ("D0037", "QWERTYZINE 10MG TAB", "tab", "3.30"),
    ("D0038", "SURGICAL GLOVES SIZE 7", "pair", "12.00"),
    ("D0039", "", "", "0.00"),
    ("D0040", "CEFALEXIN 500MG CAPSULE", "cap", "6.80"),
]

annex_path = OUT / "annex_f.csv"
with open(annex_path, "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["Drug Code", "Drug Description", "Unit", "Unit Price"])
    w.writerows(ANNEX)

# capture the merged frame BEFORE the csv round-trip mangles dtypes/lists
captured = {}
_orig_write = runners.write_csv_and_parquet


def _capture(df, csv_path):
    captured["df"] = df.copy()
    _orig_write(df, csv_path)


runners.write_csv_and_parquet = _capture

summary = runners.run_annex_f_tagging(
    annex_path=annex_path, output_path=OUT / "annex_f_with_atc.csv",
    verbose=False)
print({k: summary[k] for k in ("total", "matched_atc", "reason_counts")})

merged = captured["df"]
NULL = "<NULL>"
LIST_COLS = {"dose_values", "dose_units", "dose_types"}


def ser(col, v):
    if v is None or (isinstance(v, float) and pd.isna(v)):
        return NULL
    if col in LIST_COLS:
        if isinstance(v, (list, tuple)):
            return "|".join(str(x) for x in v) if v else NULL
        return NULL
    if isinstance(v, float):
        return repr(v)
    return str(v)


cols = list(merged.columns)
with open(OUT / "golden.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["row_id"] + cols)
    for i, rec in enumerate(merged.to_dict("records")):
        w.writerow([i] + [ser(c, rec.get(c)) for c in cols])
print(f"golden: {len(merged)} rows, columns in order: {cols}")

# ---- re-tag probe (documented finding, not a golden): feeding the
# runner its OWN OUTPUT crashes inside run_annex_f_tagging — the
# reference merges the fresh tag columns onto a frame that already
# carries them (no drop of pre-existing merge columns), producing
# duplicate/suffixed columns and a KeyError on merged["atc_code"].
# The reference therefore does NOT support re-tagging a tagged file;
# graft's AnnexFTagging.dropStale (marker-gated drop, loud failure on
# unmarked collisions) is an intentional extension that makes re-tag
# idempotent — pinned graft-side by AnnexFTaggingSpec's re-tag tests
# against golden.csv, which stays the single source of expected cells.
retag_in = OUT / "annex_f_with_atc.csv"
captured.clear()
try:
    runners.run_annex_f_tagging(
        annex_path=retag_in, output_path=OUT / "annex_f_retag.csv",
        verbose=False)
    print("NOTE: reference re-tag unexpectedly succeeded — "
          "revisit AnnexFTagging.dropStale docs")
except Exception as e:  # noqa: BLE001
    print(f"re-tag: reference crashes as documented ({type(e).__name__})")

# keep only annex_f.csv + golden.csv in resources
for f in UNIFIED + ["annex_f_with_atc.csv", "annex_f_retag.csv",
                    "metrics_history.csv"]:
    p = OUT / f
    if p.exists():
        p.unlink()
