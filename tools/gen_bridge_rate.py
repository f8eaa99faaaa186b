#!/usr/bin/env python3
"""Part-4 bridge parity golden at corpus scale (~2,500 ESOA rows).

`gen_part4_golden.py` pins the full Part-2/3/4 chain row-for-row on ~56
curated ESOA texts. This generator is its volume twin, mirroring what
`gen_rate_golden.py` does for the tagger: synthesize a seeded ~2,500-row
ESOA corpus from the same families the curated golden exercises (annex
twins, brand swaps, dose-notation abuse, form/route mismatches, packs,
typos, junk, duplicates), run the REAL reference chain over it
(UnifiedTagger tag -> run_esoa_to_drug_code bridge, same annex frame as
the curated golden), and pin every row's (drug_code,
drug_code_match_reason). BridgeRateParitySpec drives the same corpus
through the registered DrugsTaggingPipeline and asserts row-level
equality — a bridge leg whose hit RATE drifts (tie-breaks, dose-key
cascades, fuzzy annex fallbacks) diverges here even when all curated
cases still pass.

Deterministic: seeded RNG, no time/locale dependence. Importing
gen_part4_golden regenerates the curated golden on import (idempotent,
byte-identical) and hands us its loaded reference modules + tagged
annex frame.
"""
import csv
import random
from pathlib import Path

import gen_part4_golden as p4  # loads the reference, tags the annex
import pandas as pd

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/graft/part4"
R = random.Random(20260814)
N = 2500

GENERICS = [d for _, d in p4.ANNEX]
BRAND_SWAPS = [
    "BIOGESIC 500MG TAB", "VENTOLIN 2.5MG/2.5ML NEBULE",
    "VENTOLIN 100MCG INHALER", "GLUCOPHAGE 500MG TABLET",
    "LOSEC 40MG CAPSULE", "ASPIRIN 80MG EC TABLET",
]
DOSE_REWRITES = [
    ("500MG", ["0.5G", "0,5G", "500 MG", "(500MG)", "500-650MG",
               "500MG X 100 TABLETS", "500 MG TAB X 30"]),
    ("250MG/5ML", ["250 MG/5 ML", "50MG/ML"]),
    ("1000000 IU", ["1MIU", "1000000 UNITS", "1 MIU"]),
    ("100MCG", ["0.1MG", "100 MCG/DOSE", "100MCG/ACTUATION"]),
    ("80MG/2ML", ["40MG/ML 2ML"]),
    ("40MG", ["40 MG", "20MG + 20MG"]),
]
FORM_SWAPS = [("TABLET", "TAB"), ("TABLET", "CAPSULE"), ("CAPSULE", "CAP"),
              ("NEBULE", "NEBULE 2.5ML"), ("VIAL", "AMPULE"),
              ("TABLET", "ORAL SUSPENSION"), ("SYRUP 60ML", "SYRUP")]
IV_TEXTS = [
    "PARACETAMOL 300MG IN 100ML NSS INFUSION",
    "MAGNESIUM SULFATE 2G IN 50ML NSS", "D5W 500ML",
    "SODIUM CHLORIDE 0.9% 500ML SOLUTION", "DEXTROSE 5% 1L",
    "DEXTROSE 50% 50 ML AMPULE", "ETHANOL 95% SOLUTION",
]
JUNK = ["SURGICAL GLOVES SIZE 7", "QWERTYZINE 10MG TAB", "OXYGEN MASK",
        "SYRINGE 5ML", "COTTON BALLS 100S", "", "EXAMINATION TABLE"]


def typo(s):
    # deterministic single-char mangle: swap two adjacent letters
    idx = [i for i in range(len(s) - 1)
           if s[i].isalpha() and s[i + 1].isalpha()]
    if not idx:
        return s
    i = R.choice(idx)
    return s[:i] + s[i + 1] + s[i] + s[i + 2:]


def variant():
    roll = R.random()
    if roll < 0.40:                       # annex-family text, maybe rewritten
        t = R.choice(GENERICS)
        if R.random() < 0.6:
            for orig, subs in DOSE_REWRITES:
                if orig in t and R.random() < 0.7:
                    t = t.replace(orig, R.choice(subs))
                    break
        if R.random() < 0.4:
            for a, b in FORM_SWAPS:
                if a in t:
                    t = t.replace(a, b)
                    break
        return t
    if roll < 0.55:
        return R.choice(BRAND_SWAPS)
    if roll < 0.65:
        return R.choice(IV_TEXTS)
    if roll < 0.75:
        return typo(R.choice(GENERICS))
    if roll < 0.85:                       # strip the dose or the form
        t = R.choice(GENERICS).split()
        k = R.randrange(1, len(t))
        return " ".join(t[:k])
    if roll < 0.93:
        return R.choice(JUNK)
    t = R.choice(GENERICS)                # case/punct abuse
    return t.lower() if R.random() < 0.5 else t.replace(" ", "  ")


texts = [variant() for _ in range(N)]

with open(OUT / "bridge_rate_texts.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["id", "text"])
    for i, t in enumerate(texts, 1):
        w.writerow([i, t])

esoa_df = p4.tag_merge(
    pd.DataFrame({"id": range(1, N + 1), "DESCRIPTION": texts}),
    "DESCRIPTION")
esoa_path = OUT / "bridge_rate_esoa_with_atc.csv"
esoa_df.to_csv(esoa_path, index=False)

out_path = OUT / "bridge_rate_with_drug_code.csv"
p4.runners.run_esoa_to_drug_code(
    esoa_path=esoa_path, annex_path=p4.annex_path, output_path=out_path,
    verbose=False)

res = pd.read_csv(out_path)
NULL = "<NULL>"
reasons = {}
with open(OUT / "bridge_rate_golden.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["id", "drug_code", "drug_code_match_reason"])
    for _, r in res.iterrows():
        reason = (NULL if pd.isna(r["drug_code_match_reason"])
                  else r["drug_code_match_reason"])
        w.writerow([int(r["id"]),
                    NULL if pd.isna(r["drug_code"]) else r["drug_code"],
                    reason])
        reasons[reason] = reasons.get(reason, 0) + 1

# the intermediate frames are reference output we recompute in Scala
esoa_path.unlink()
out_path.unlink()
for p in OUT.glob("*.parquet"):
    p.unlink()
print("bridge rate golden:", N, "rows; reasons:", dict(sorted(reasons.items())))
