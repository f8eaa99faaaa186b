#!/usr/bin/env python3
"""Generate the end-to-end Part-4 (ESOA -> Drug Code) reference golden.

Chains the REAL reference code: tag an Annex F frame and an ESOA frame
with UnifiedTagger over the same synthetic catalog the tagger e2e golden
uses (src/test/resources/graft/e2e), assemble the *_with_atc frames the
way run_annex_f_tagging / run_esoa_tagging merge them, then call
run_esoa_to_drug_code and pin (drug_code, drug_code_match_reason) per
ESOA row as the golden for Part4BridgeE2ESpec.
"""
import csv
import importlib.util
import os
import sys
import types
from pathlib import Path

BASE = Path("/root/reference/pipelines/drugs/scripts")
E2E = Path(__file__).resolve().parent.parent / "src/test/resources/graft/e2e"
OUT = Path(__file__).resolve().parent.parent / "src/test/resources/graft/part4"
OUT.mkdir(parents=True, exist_ok=True)
os.environ["PIPELINE_OUTPUTS_DIR"] = str(OUT)

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

PKG = "refscripts4"
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

ANNEX = [
    ("D001", "PARACETAMOL 500MG TABLET"),
    ("D002", "PARACETAMOL 250MG/5ML SYRUP 60ML"),
    ("D003", "IBUPROFEN 400MG TABLET"),
    ("D004", "OMEPRAZOLE 40MG CAPSULE"),
    ("D005", "OMEPRAZOLE 40MG IV VIAL"),
    ("D006", "METFORMIN 500MG TABLET"),
    ("D007", "METFORMIN 500MG EXTENDED RELEASE TABLET"),
    ("D008", "AMOXICILLIN 500MG CAPSULE"),
    ("D009", "AMOXICILLIN + CLAVULANIC ACID 625MG TABLET"),
    ("D010", "SALBUTAMOL 2.5MG/2.5ML NEBULE"),
    ("D011", "ACETYLSALICYLIC ACID 80MG TABLET"),
    ("D012", "SODIUM CHLORIDE 0.9% 1L SOLUTION"),
    ("D013", "DEXTROSE 5% IN WATER 1L"),
    ("D014", "LOSARTAN 50MG TABLET"),
    ("D015", "MAGNESIUM SULFATE 250MG/ML VIAL"),
    ("D016", "ISOSORBIDE DINITRATE 5MG SUBLINGUAL TABLET"),
    ("D017", "LAMIVUDINE + ZIDOVUDINE 150MG/300MG TABLET"),
    ("D018", "PARACETAMOL 500MG TABLET"),
    ("D019", "BENZYLPENICILLIN 1000000 IU VIAL"),
    ("D020", "AMOXICILLIN + CLAVULANIC ACID 500MG/125MG TABLET"),
    ("D021", "PARACETAMOL 500MG SUPPOSITORY"),
    ("D022", "SALBUTAMOL 100MCG INHALER"),
    ("D023", "DEXTROSE 50% 50ML VIAL"),
    ("D024", "FERROUS SULFATE 325MG TABLET"),
    ("D025", "GENTAMICIN 80MG/2ML VIAL"),
]

ESOA = [
    "PARACETAMOL 500MG TABLET",
    "BIOGESIC 500MG TAB",
    "PARACETAMOL 250MG TABLET",
    "PARACETAMOL TABLET",
    "IBUPROFEN 400MG ORAL SUSPENSION",
    "OMEPRAZOLE 40MG IV VIAL",
    "OMEPRAZOLE 40MG CAPSULE",
    "METFORMIN 500MG EXTENDED RELEASE TABLET",
    "METFORMIN 500MG TABLET",
    "AMOXICILIN 500MG CAP",
    "CO-AMOXICLAV 625MG TABLET",
    "VENTOLIN NEBULE 1MG/ML 2.5ML",
    "ASPIRIN 80MG EC TABLET",
    "CETIRIZINE 10MG TABLET",
    "",
    "SURGICAL GLOVES SIZE 7",
    "LOSARTAN 50MG TAB",
    "PARACETAMOL 300MG IN 100ML NSS INFUSION",
    "D5W 500ML",
    "MAGNESIUM SULFATE 2G IN 50ML NSS",
    "ISOSORBIDE 10MG TABLET",
    "LAMIVUDINE + ZIDOVUDINE 150MG/300MG TABLET",
    "QWERTYZINE 10MG TAB",
    "ETHANOL 95% SOLUTION",
    "GLUCOPHAGE 500MG TABLET",
    "PARACETAMOL 500 MG TAB",
    "BENZYLPENICILLIN 1000000 IU VIAL",
    "BENZYLPENICILLIN 500000 IU VIAL",
    "CO-AMOXICLAV 500MG/125MG TAB",
    "PARACETAMOL 500MG SUPPOSITORY",
    "VENTOLIN 100MCG INHALER",
    "SALBUTAMOL 0.1MG INHALER",
    "DEXTROSE 50% 50ML",
    "FERROUS SULFATE 325MG TABLET",
    "AMOXICILLIN 500MG + CLAVULANIC ACID 125MG TABLET",
    "GENTAMICIN 80MG/2ML VIAL",
    # ---- round-7 expansion: dose-cascade stressors
    "PARACETAMOL 0.5G TABLET",              # g->mg conversion must hit D001
    "OMEPRAZOLE 40MG",                      # no form/route: D004 vs D005 tie
    "PARACETAMOL 500MG",                    # tablet vs suppository tie
    "SALBUTAMOL 100 MCG/DOSE INHALER",      # spaced mcg/dose vs D022
    "SODIUM CHLORIDE 0.9% 500ML SOLUTION",  # percent strength, volume differs
    "AMOXICILLIN 500MG TABLET",             # capsule-only annex: form mismatch
    "MAGNESIUM SULFATE 250 MG/ML 10ML VIAL",# spaced concentration
    "IBUPROFEN 400MG TABLET",               # exact annex twin of D003
    "DEXTROSE 5% 1L",                       # bare D5 phrasing vs D013
    "PENICILLIN G 1000000 UNITS VIAL",      # UNITS spelling of IU + synonym
    # ---- round-8 expansion: more cascade stressors
    "PARACETAMOL 0,5G TAB",                 # decimal-comma strength
    "PARACETAMOL 500-650MG TAB",            # dose range: which bound keys?
    "PARACETAMOL 500MG X 100 TABLETS",      # pack multiplier after strength
    "AMOXICILLIN (500MG) CAPSULE",          # parenthesized strength
    "GENTAMICIN 40MG/ML 2ML VIAL",          # same total, different phrasing
    "BENZYLPENICILLIN 1MIU VIAL",           # MIU abbreviation of 1e6 IU
    "SALBUTAMOL 100MCG/ACTUATION INHALER",  # per-actuation strength
    "FERROUS SULFATE 325 MG TAB X 30",      # spaced strength + pack count
    "OMEPRAZOLE 20MG + 20MG TABLET",        # repeated strength tokens
    "DEXTROSE 50% 50 ML AMPULE",            # spaced volume, ampule form
]

MERGE_COLS = [
    "atc_code", "drugbank_id", "generic_name", "reference_text",
    "match_score", "match_reason", "sources", "dose", "form", "route",
    "type_details", "release_details", "form_details", "salt_details",
    "brand_details", "indication_details", "alias_details",
    "diluent_details", "iv_diluent_type", "iv_diluent_amount",
    "dose_values", "dose_units", "dose_types", "total_volume_ml",
    "drug_amount_mg", "diluent_amount_mg", "concentration_mg_per_ml",
]
RENAME = {"generic_name": "matched_generic_name",
          "reference_text": "matched_reference_text",
          "sources": "matched_source"}

tagger = load("tagger") if False else sys.modules[f"{PKG}.tagger"]
ut = tagger.UnifiedTagger(outputs_dir=E2E, inputs_dir=E2E, verbose=False)
ut.load()


def tag_merge(df, text_col):
    res = ut.tag_descriptions(df.reset_index(drop=True), text_column=text_col)
    res = res[[c for c in MERGE_COLS if c in res.columns]].reset_index(drop=True)
    merged = pd.concat([df.reset_index(drop=True), res], axis=1)
    return merged.rename(columns=RENAME)


annex_df = tag_merge(
    pd.DataFrame({"Drug Code": [c for c, _ in ANNEX],
                  "Drug Description": [d for _, d in ANNEX]}),
    "Drug Description")
esoa_df = tag_merge(
    pd.DataFrame({"id": range(1, len(ESOA) + 1), "DESCRIPTION": ESOA}),
    "DESCRIPTION")

annex_path = OUT / "annex_f_with_atc.csv"
esoa_path = OUT / "esoa_with_atc.csv"
annex_df.to_csv(annex_path, index=False)
esoa_df.to_csv(esoa_path, index=False)

out_path = OUT / "esoa_with_drug_code.csv"
summary = runners.run_esoa_to_drug_code(
    esoa_path=esoa_path, annex_path=annex_path, output_path=out_path,
    verbose=True)

res = pd.read_csv(out_path)
NULL = "<NULL>"
with open(OUT / "golden.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["id", "DESCRIPTION", "drug_code", "drug_code_match_reason"])
    for _, r in res.iterrows():
        w.writerow([int(r["id"]),
                    "" if pd.isna(r["DESCRIPTION"]) else r["DESCRIPTION"],
                    NULL if pd.isna(r["drug_code"]) else r["drug_code"],
                    NULL if pd.isna(r["drug_code_match_reason"])
                    else r["drug_code_match_reason"]])
for _, r in res.iterrows():
    print(int(r["id"]), "|", r["DESCRIPTION"], "->", r["drug_code"],
          r["drug_code_match_reason"])
# the parquet twin written by write_csv_and_parquet is not needed
for p in OUT.glob("*.parquet"):
    p.unlink()
