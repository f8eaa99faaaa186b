#!/usr/bin/env python3
"""Aggregate match-rate parity golden at corpus scale (~5k rows).

The e2e golden pins cell-for-cell parity at ~150 curated texts; the
reference's PUBLISHED metrics, though, are aggregate match rates over a
146k-row corpus (BASELINE.md). This generator is the affordable proxy:
it synthesizes a 5,000-row corpus from the SAME vocabulary families the
cell-level golden exercises (generics, brands, salts, synonyms, typos,
mixtures, IV strings, junk, duplicates, case/punctuation abuse), runs
the REAL reference tagger over it (same standalone loader as
gen_e2e_golden), and pins only the AGGREGATES:

  - match_reason distribution (exact counts)
  - floored match_score distribution
  - presence counts for atc_code / drugbank_id / dose / form / route
  - distinct matched generic_name count

RateParitySpec.scala re-tags the same corpus with ScoredTagger.tagTexts
and asserts every count matches exactly. A rate-level regression that
individual curated cases miss (e.g. a leg silently matching less often)
shows up here as a count drift.

Deterministic: seeded RNG, no time/locale dependence. Reuses
gen_e2e_golden's loader + synthetic catalog via import (that module
regenerates the e2e goldens on import — idempotent and byte-identical).
"""
import csv
import random
import sys
from pathlib import Path

import gen_e2e_golden as e2e  # loads the reference + writes e2e goldens

OUT = Path(__file__).resolve().parent.parent / "src/test/resources/graft/rate"
OUT.mkdir(parents=True, exist_ok=True)

R = random.Random(20260813)
N = 5000

GENERIC_NAMES = [g for _, g, _ in e2e.GENERICS]
BRAND_NAMES = sorted({b for b, _ in e2e.BRANDS}) + ["LOSEC"]
SYNONYM_FORMS = ["ASA", "NSS", "D5W", "PENICILLIN G", "CETIRIZINA",
                 "VITAMIN C", "ETHYL ALCOHOL", "PARACETAMOL"]
MIXTURE_TEXTS = ["LAMIVUDINE + ZIDOVUDINE", "LAMIVUDINE/ZIDOVUDINE",
                 "AMOXICILLIN + CLAVULANIC ACID", "CO-AMOXICLAV",
                 "CO AMOXICLAV", "GLUCOSE + NSS",
                 "DEXTROSE AND SODIUM CHLORIDE"]
VACCINES = ["INFLUENZA VACCINE", "DTP VACCINE", "DTP", "BCG VACCINE",
            "HEPATITIS B VACCINE"]
JUNK = ["SURGICAL GLOVES SIZE 7", "OXYGEN MASK ADULT", "XYZ 10",
        "QWERTYZINE 10MG TAB", "EXAMINATION TABLE", "SYRINGE 5ML",
        "COTTON BALLS 100S", "WHEELCHAIR STANDARD", ""]
DOSES = ["500MG", "250MG", "1G", "0.5 G", "0,5G", "100MCG", "50UG",
         "2.5MG/2.5ML", "250MG/5ML", "5%", "1MG/ML", "1000000 IU",
         "80MG/2ML", "500-650MG", "160/4.5MCG", "(500MG)", "100 UNITS/ML",
         "5000 IU/ML", ""]
FORMS = ["TABLET", "TAB", "CAPSULE", "CAP", "VIAL", "AMPULE", "SYRUP 60ML",
         "SUSPENSION", "INHALER", "NEBULE", "EC TABLET",
         "FILM COATED TABLET", "POWDER FOR INJECTION", "ORAL DROPS",
         "EXTENDED RELEASE TABLET", "DELAYED RELEASE CAPSULE",
         "PREFILLED SYRINGE", "SUPPOSITORY", ""]
IV_BASES = ["PARACETAMOL", "DOPAMINE", "DOBUTAMINE", "MAGNESIUM SULFATE"]
IV_DILUENTS = ["NSS", "D5W", "STERILE WATER"]
SALTS = ["(AS BESILATE)", "(AS TRIHYDRATE)", "SULFATE", "HYDROCHLORIDE",
         "SODIUM", "POTASSIUM"]


def typo(word: str) -> str:
    """Seeded single-character typo: drop, duplicate, or swap."""
    if len(word) < 5:
        return word
    i = R.randrange(1, len(word) - 1)
    op = R.randrange(3)
    if op == 0:
        return word[:i] + word[i + 1:]
    if op == 1:
        return word[:i] + word[i] + word[i:]
    return word[:i] + word[i + 1] + word[i] + word[i + 2:]


def mangle_case(t: str) -> str:
    op = R.randrange(4)
    if op == 0:
        return t.lower()
    if op == 1:
        return t.title()
    if op == 2:
        return "".join(c.lower() if R.randrange(2) else c for c in t)
    return t


def one_text() -> str:
    roll = R.randrange(100)
    if roll < 40:  # plain generic (sometimes salted / typo'd / cased)
        g = R.choice(GENERIC_NAMES)
        sub = R.randrange(10)
        if sub < 2:
            g = typo(g)
        elif sub < 4:
            g = f"{g} {R.choice(SALTS)}"
        elif sub < 5:
            g = mangle_case(g)
        return f"{g} {R.choice(DOSES)} {R.choice(FORMS)}"
    if roll < 50:  # brand (occasionally brand+generic in one text)
        b = R.choice(BRAND_NAMES)
        if R.randrange(5) == 0:
            b = f"{b} {R.choice(['ACETAMINOPHEN', 'PARACETAMOL', 'IBUPROFEN'])}"
        return f"{b} {R.choice(DOSES)} {R.choice(FORMS)}"
    if roll < 58:  # synonym / abbreviation layer
        return f"{R.choice(SYNONYM_FORMS)} {R.choice(DOSES)} {R.choice(FORMS)}"
    if roll < 66:  # mixtures / combinations
        return f"{R.choice(MIXTURE_TEXTS)} {R.choice(DOSES)} {R.choice(FORMS)}"
    if roll < 72:  # vaccines
        return f"{R.choice(VACCINES)} 0.5ML {R.choice(['AMPULE', 'VIAL', 'PREFILLED SYRINGE', ''])}"
    if roll < 80:  # IV admixture strings (dose math path)
        return (f"{R.choice(IV_BASES)} {R.choice(['300MG', '2G', '200MG', '250MG'])} "
                f"IN {R.choice(['100ML', '250ML', '50ML'])} {R.choice(IV_DILUENTS)}"
                f"{R.choice([' INFUSION', ' DRIP', ''])}")
    if roll < 88:  # separator / ordering abuse on a known generic
        g = R.choice(GENERIC_NAMES)
        d = R.choice(["500MG", "250MG", "1G"])
        f = R.choice(["TAB", "TABLET", "CAP"])
        return R.choice([
            f"{g};{d},{f}", f"{g}/{d} {f}", f"{d} {g} {f}",
            f"{g}\t{d}\t{f}", f"  {g}   {d}   {f}  ", f"ITEM: {g} {d} {f}",
            f"{g} {d} {f} #100", f"{g} {g} {d} {f}",
        ])
    return R.choice(JUNK)  # 12%: junk / non-drug / empty


texts = [one_text() for _ in range(int(N * 0.9))]
# 10% exact duplicates of earlier rows: the dedup-before-tag path must
# not change aggregate rates
texts += [R.choice(texts) for _ in range(N - len(texts))]


def write_csv(name, header, rows):
    with open(OUT / name, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


write_csv("rate_texts.csv", ["id", "text"], list(enumerate(texts, start=1)))

import pandas as pd  # noqa: E402

df = pd.DataFrame({"id": range(1, N + 1), "text": texts})
res = e2e.tagger.tag_descriptions(df, text_column="text", id_column="id")


def present(v):
    return not (v is None or (isinstance(v, float) and pd.isna(v))
                or str(v) in ("", "None"))


counts = {}
for rec in res.to_dict("records"):
    counts[f"reason:{rec.get('match_reason')}"] = \
        counts.get(f"reason:{rec.get('match_reason')}", 0) + 1
    sc = rec.get("match_score")
    sb = int(float(sc)) if present(sc) else -1
    counts[f"score:{sb}"] = counts.get(f"score:{sb}", 0) + 1
    for c in ["atc_code", "drugbank_id", "dose", "form", "route"]:
        if present(rec.get(c)):
            counts[f"{c}_present"] = counts.get(f"{c}_present", 0) + 1
counts["rows"] = len(res)
counts["distinct_generics"] = len(
    {str(r["generic_name"]) for r in res.to_dict("records")
     if present(r.get("generic_name"))})

write_csv("rate_golden.csv", ["metric", "count"],
          sorted(counts.items()))
print(f"rate corpus: {N} texts -> {OUT}")
for k, v in sorted(counts.items()):
    print(f"  {k} = {v}")
