#!/usr/bin/env python3
"""Generate the end-to-end reference-parity golden for the tagger.

Loads the reference implementation (/root/reference, read-only) standalone
via importlib, feeds it a synthetic unified_* catalog + a curated text set
that exercises every lookup leg, and dumps the reference's ACTUAL output
as CSV goldens under src/test/resources/graft/e2e/. The Scala spec
E2EReferenceParitySpec then runs graft's ScoredTagger.tagTexts over the
same catalog CSVs and asserts column-by-column parity.

rapidfuzz is not installed in this container; lookup.py degrades to
no-fuzzy without it, so we shim the two entry points it uses with the
PUBLISHED formula (fuzz.ratio = 100*(1 - indel/(|a|+|b|)), indel =
|a|+|b|-2*LCS) — the same formula graft.functions.FuzzyLib implements.
"""
import csv
import importlib.util
import os
import sys
import types
from pathlib import Path

BASE = Path("/root/reference/pipelines/drugs/scripts")
OUT = Path(__file__).resolve().parent.parent / "src/test/resources/graft/e2e"
OUT.mkdir(parents=True, exist_ok=True)

# ---------------------------------------------------------------- rapidfuzz shim
def _lcs(a: str, b: str) -> int:
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
    indel = ls - 2 * _lcs(a, b)
    return 100.0 * (1.0 - indel / ls)


def _extract(query, choices, scorer=None, limit=5, score_cutoff=0, **kw):
    scorer = scorer or _ratio
    scored = []
    for idx, c in enumerate(choices):
        s = scorer(query, c)
        if s >= score_cutoff:
            scored.append((c, s, idx))
    scored.sort(key=lambda t: (-t[1], t[2]))  # score desc, input order on ties
    return scored[: limit if limit else len(scored)]


rf = types.ModuleType("rapidfuzz")
rf.fuzz = types.SimpleNamespace(ratio=_ratio)
rf.process = types.SimpleNamespace(extract=_extract)
sys.modules["rapidfuzz"] = rf

# ---------------------------------------------------------------- module loader
PKG = "refscripts"
pkg = types.ModuleType(PKG)
pkg.__path__ = [str(BASE)]
sys.modules[PKG] = pkg


def load(name: str):
    spec = importlib.util.spec_from_file_location(f"{PKG}.{name}", BASE / f"{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[f"{PKG}.{name}"] = mod
    spec.loader.exec_module(mod)
    return mod


for m in ["unified_constants", "form_route_mapping", "tokenizer", "scoring",
          "lookup", "spinner"]:
    load(m)
tagger_mod = load("tagger")

# ---------------------------------------------------------------- synthetic catalog
GENERICS = [
    # drugbank_id, generic_name, source
    ("DB00316", "ACETAMINOPHEN", "drugbank"),
    ("DB01050", "IBUPROFEN", "drugbank"),
    ("DB01060", "AMOXICILLIN", "drugbank"),
    ("DB00766", "CLAVULANIC ACID", "drugbank"),
    ("DB01001", "SALBUTAMOL", "who"),
    ("DB00331", "METFORMIN", "drugbank"),
    ("DB00332", "METFORMIN HYDROCHLORIDE", "drugbank"),
    ("DB00678", "LOSARTAN POTASSIUM", "drugbank"),
    # amlodipine salts: strictly increasing name lengths so the
    # shortest-3 prefix cut is deterministic in both engines
    ("DB00381", "AMLODIPINE MALEATE", "drugbank"),
    ("DB00382", "AMLODIPINE BESILATE", "drugbank"),
    ("DB00383", "AMLODIPINE CAMSYLATE", "drugbank"),
    ("DB00384", "AMLODIPINE BENZOATE HYDRATE", "drugbank"),
    ("DB00883", "ISOSORBIDE DINITRATE", "drugbank"),
    ("DB00898", "ETHANOL", "drugbank"),
    ("DB00653", "MAGNESIUM SULFATE", "drugbank"),
    ("DB01222", "BUDESONIDE", "drugbank"),
    ("DB00983", "FORMOTEROL", "drugbank"),
    ("DB09999", "BUDESONIDE + FORMOTEROL", "who"),
    ("DB00512", "CETIRIZINE", "drugbank"),
    ("DB01211", "CLARITHROMYCIN", "drugbank"),
    ("DBVAC01", "INFLUENZA VACCINE", "who"),
    ("DBVAC02", "DIPHTHERIA + PERTUSSIS + TETANUS", "who"),
    ("DB00945", "ACETYLSALICYLIC ACID", "drugbank"),
    ("DB09341", "DEXTROSE", "drugbank"),
    ("DB09153", "SODIUM CHLORIDE", "drugbank"),
    ("DB00338", "OMEPRAZOLE", "drugbank"),
    ("DB00213", "PANTOPRAZOLE", "drugbank"),  # deliberately NO atc row
    ("DB01053", "BENZYLPENICILLIN", "drugbank"),
    ("DB00158", "ASCORBIC ACID", "drugbank"),
    ("DBFS001", "FERROUS SULFATE", "drugbank"),
    ("DBVAC03", "BCG VACCINE", "who"),
    # regional-direction probes: only the REGIONAL name is in the catalog
    # (ADRENALINE) or only the US name is absent (MEPERIDINE present) —
    # the tagger dict maps regional->US ONLY (REGIONAL_TO_US), so
    # EPINEPHRINE never rewrites to ADRENALINE while PETHIDINE does
    # rewrite to MEPERIDINE
    ("DB00668", "ADRENALINE", "who"),
    ("DB00454", "MEPERIDINE", "drugbank"),
    # WHO-layer row with NO drugbank id and NO atc row: the reference's
    # candidate loop still emits it with the "None" ATC string
    ("", "GUAIFENESIN", "who"),
    ("DB00798", "GENTAMICIN", "drugbank"),
]

ATC = [
    ("ACETAMINOPHEN", "N02BE01|N02BE51"),  # combination suffix second
    ("IBUPROFEN", "M01AE01"),
    ("AMOXICILLIN", "J01CA04"),
    ("CLAVULANIC ACID", "J01CG01"),
    ("SALBUTAMOL", "R03AC02"),
    ("METFORMIN", "A10BA02"),
    ("METFORMIN HYDROCHLORIDE", "A10BA02"),
    ("LOSARTAN POTASSIUM", "C09CA01"),
    ("AMLODIPINE MALEATE", "C08CA01"),
    ("AMLODIPINE BESILATE", "C08CA02"),
    ("AMLODIPINE CAMSYLATE", "C08CA03"),
    ("AMLODIPINE BENZOATE HYDRATE", "C08CA04"),
    ("ISOSORBIDE DINITRATE", "C01DA08"),
    ("ETHANOL", "D08AX08"),
    ("MAGNESIUM SULFATE", "A06AD04|B05XA05"),
    ("BUDESONIDE", "R03BA02"),
    ("FORMOTEROL", "R03AC13"),
    ("BUDESONIDE + FORMOTEROL", "R03AK07"),
    ("CETIRIZINE", "R06AE07"),
    ("CLARITHROMYCIN", "J01FA09"),
    ("INFLUENZA VACCINE", "J07BB01"),
    ("DIPHTHERIA + PERTUSSIS + TETANUS", "J07AJ52"),
    ("ACETYLSALICYLIC ACID", "B01AC06|N02BA01"),
    ("DEXTROSE", "B05CX01"),
    ("SODIUM CHLORIDE", "B05CB01"),
    ("OMEPRAZOLE", "A02BC01"),
    ("BENZYLPENICILLIN", "J01CE01"),
    ("ASCORBIC ACID", "A11GA01"),
    ("FERROUS SULFATE", "B03AA07"),
    ("BCG VACCINE", "J07AN01"),
    ("ADRENALINE", "C01CA24"),
    ("MEPERIDINE", "N02AB02"),
    ("GENTAMICIN", "J01GB03"),
]

BRANDS = [
    ("BIOGESIC", "ACETAMINOPHEN"),
    ("BIOGESIC", "ACETAMINOPHEN"),
    ("BIOGESIC", "ACETAMINOPHEN"),
    ("TYLENOL", "ACETAMINOPHEN"),
    ("VENTOLIN", "SALBUTAMOL"),
    ("GLUCOPHAGE", "METFORMIN HYDROCHLORIDE"),
    # FDA swapped row: brand_name is a known generic -> ADVIL maps to IBUPROFEN
    ("IBUPROFEN", "ADVIL"),
    # case-variant rows: the reference counts RAW-cased groups, so the
    # two IBUPROFEN variants (2+2) never outrank ACETAMINOPHEN (3)
    ("Biogesic", "IBUPROFEN"),
    ("Biogesic", "IBUPROFEN"),
    ("biogesic", "IBUPROFEN"),
    ("biogesic", "IBUPROFEN"),
]

MIXTURES = [
    # drugbank_id, mixture_name, component_generics, component_keys,
    # component_key, component_count
    ("DBMIX01", "LAMIVUDINE AND ZIDOVUDINE", "lamivudine|zidovudine",
     "lamivudine|zidovudine", "lamivudine|zidovudine", 2),
    ("DBMIX02", "AMOXICILLIN + CLAVULANIC ACID",
     "amoxicillin|clavulanic acid", "amoxicillin|clavulanic acid",
     "amoxicillin|clavulanic acid", 2),
    # reachable only through the synonym-normalized component key
    # (GLUCOSE -> DEXTROSE, NSS -> SODIUM CHLORIDE)
    ("DBMIX03", "DEXTROSE AND SODIUM CHLORIDE",
     "dextrose|sodium chloride", "dextrose|sodium chloride",
     "dextrose|sodium chloride", 2),
]

TEXTS = [
    "PARACETAMOL 500MG TABLET",
    "ACETAMINOPHEN 500 MG TAB",
    "BIOGESIC 500MG TAB",
    "TYLENOL FORTE 500MG TABLET",
    "ADVIL 200MG CAPSULE",
    "IBUPROFEN 400MG FILM COATED TABLET",
    "AMOXICILIN 500MG CAP",
    "AMOXICILLIN 250MG/5ML SUSPENSION 60ML",
    "LOSARTAN 50MG TAB",
    "AMLODIPINE 5MG TABLET",
    "METFORMIN HCL 500MG TAB",
    "METFORMIN 850MG TABLET",
    "SALBUTAMOL 2.5MG/2.5ML NEBULE",
    "VENTOLIN NEBULE 1MG/ML 2.5ML",
    "ISOSORBIDE DINITRATE 5MG SUBLINGUAL TABLET",
    "ETHYL ALCOHOL 70% SOLUTION 500ML",
    "MAGNESIUM SULFATE 250MG/ML VIAL",
    "BUDESONIDE + FORMOTEROL 160/4.5MCG INHALER",
    "LAMIVUDINE + ZIDOVUDINE 150MG/300MG TABLET",
    "CO-AMOXICLAV 625MG TABLET",
    "AUGMENTIN 1G TABLET",
    "INFLUENZA VACCINE 0.5ML PREFILLED SYRINGE",
    "DTP VACCINE 0.5ML AMPULE",
    "ASA 80MG TABLET",
    "ASPIRIN 100MG EC TABLET",
    "D5W 500ML",
    "PARACETAMOL 300MG IN 100ML NSS INFUSION",
    "DOPAMINE 200MG IN 250ML D5W",
    "OMEPRAZOLE 40MG IV VIAL",
    "PANTOPRAZOLE 40MG TABLET",
    "CETIRIZINE 10MG/ML ORAL DROPS",
    "CLARITHROMYCIN 500MG ER TABLET",
    "SURGICAL GLOVES SIZE 7",
    "OXYGEN MASK ADULT",
    "QWERTYZINE 10MG TAB",
    "",
    "SODIUM CHLORIDE 0.9% 1L BOTTLE",
    "ACETYLSALICYLIC ACID 80MG TABLET",
    "AMLODIPINE BESILATE 10MG TABLET",
    "LOSARTAN POTASSIUM 100MG TABLET",
    "PARACETAMOL 250MG/5ML SYRUP 60ML",
    "PARACETAMOL + IBUPROFEN 325/200MG TABLET",
    "GLUCOPHAGE 500MG TABLET",
    "VITAMIN B COMPLEX TABLET",
    "CEFALEXIN 500MG CAPSULE",
    "paracetamol 500 mg tablet",
    "Ibuprofen 200mg tab",
    # ---- round-3 corpus expansion: details, salts, IV math, punctuation
    "METFORMIN 500MG EXTENDED RELEASE TABLET",
    "OMEPRAZOLE 20MG DELAYED RELEASE CAPSULE",
    "CLARITHROMYCIN 500MG MODIFIED RELEASE TAB",
    "IBUPROFEN 100MG/5ML SUSPENSION PEDIATRIC",
    "AMOXICILLIN (AS TRIHYDRATE) 500MG CAPSULE",
    "AMLODIPINE (AS BESILATE) 5MG TABLET",
    "CETIRIZINE DIHYDROCHLORIDE 10MG TABLET",
    "SALBUTAMOL SULFATE 100MCG/DOSE INHALER",
    "PARACETAMOL 1G IV INFUSION",
    "OMEPRAZOLE 40MG POWDER FOR INJECTION",
    "DEXTROSE 5% IN WATER 1L",
    "SODIUM CHLORIDE 0.45% 500ML",
    "MAGNESIUM SULFATE 2G IN 50ML NSS",
    "AMOXICILLIN 500MG, CAPSULE",
    "IBUPROFEN, 400 MG, TABLET",
    "LOSARTAN 100 MG FILM-COATED TABLET",
    "PARACETAMOL 120MG/5ML 60ML SYRUP",
    "ASA EC 80MG TABLET",
    "ETHANOL 95% SOLUTION",
    "BUDESONIDE 200MCG + FORMOTEROL 6MCG INHALATION POWDER",
    "IBUPROFEN + PARACETAMOL + CAFFEINE TABLET",
    "AMOXICILLIN + CLAVULANIC ACID 625MG TABLET",
    "CLAVULANIC ACID 125MG TABLET",
    "DTP",
    "INFLUENZA VACCINE (QUADRIVALENT) 0.5ML",
    "HEPATITIS B VACCINE PEDIATRIC 0.5ML",
    "XYZ 10",
    "AMOX 250MG CAP",
    "METFORMIN+",
    "  PARACETAMOL   500MG   TAB  ",
    "PARACETAMOL FOR FEVER 500MG TAB",
    "OMEPRAZOLE (LOSEC) 20MG CAPSULE",
    "SALBUTAMOL NEB 2.5MG/2.5ML EVERY 6 HOURS",
    "AMLODIPINE BENZOATE HYDRATE 10MG TABLET",
    "AMLODIPINE CAMSYLATE 5MG TAB",
    "PANTOPRAZOLE SODIUM 40MG VIAL",
    "LOSARTAN+AMLODIPINE 50/5MG TABLET",
    "ISOSORBIDE 10MG TABLET",
    "CEFUROXIME 750MG VIAL",
    "DOBUTAMINE 250MG IN 250ML D5W DRIP",
    "DTP 0.5ML",
    "BCG VACCINE 0.05ML INTRADERMAL",
    "BENZYLPENICILLIN 1000000 IU VIAL",
    "ASCORBIC ACID (VITAMIN C) 500MG TABLET",
    "FERROUS SULFATE 325MG TABLET",
    "FERROUS SULFATE + FOLIC ACID TABLET",
    "AMOXICILLIN 500MG + CLAVULANIC ACID 125MG TABLET",
    "SALBUTAMOL 2MG/5ML SYRUP 60ML",
    "PARACETAMOL 500MG SUPPOSITORY",
    "VITAMIN C 500MG TAB",
    "EPINEPHRINE 1MG/ML AMPULE",
    "ADRENALINE 1MG/ML AMPULE",
    "PETHIDINE 50MG AMPULE",
    "MEPERIDINE 50MG AMPULE",
    "PENICILLIN G 1000000 IU VIAL",
    "CETIRIZINA 10MG TABLET",
    "GUAIFENESIN 100MG/5ML SYRUP 60ML",
    "GLUCOSE + NSS 1L BOTTLE",
    "GENTAMICIN 80MG/2ML VIAL",
    # duplicates (dedup-before-tag must not change per-text results)
    "PARACETAMOL 500MG TABLET",
    "BIOGESIC 500MG TAB",
    "AMOXICILIN 500MG CAP",
    "AMLODIPINE 5MG TABLET",
    "LAMIVUDINE + ZIDOVUDINE 150MG/300MG TABLET",
    "CO-AMOXICLAV 625MG TABLET",
    "DTP VACCINE 0.5ML AMPULE",
    "PARACETAMOL 300MG IN 100ML NSS INFUSION",
    "QWERTYZINE 10MG TAB",
    "",
    # ---- round-7 adversarial expansion: punctuation/separator abuse,
    #      ratio & unit strengths, brand+generic in one text, tabs,
    #      numbers-first ordering, percent gels, IU-per-ml
    "PARACETAMOL;500MG,TAB",
    "PARACETAMOL/IBUPROFEN 325/200MG TAB",
    "500MG PARACETAMOL TABLET",
    "BIOGESIC PARACETAMOL 500MG TAB",
    "LIDOCAINE 2% GEL 30G",
    "EPINEPHRINE 1:1000 1ML AMPULE",
    "HEPARIN 5000 IU/ML VIAL 5ML",
    "INSULIN 100 UNITS/ML VIAL",
    "LEVOTHYROXINE 50MCG TABLET",
    "PARACETAMOL\t500MG\tTABLET",
    "IBUPROFEN 200 MG TAB (OVER THE COUNTER)",
    "CO AMOXICLAV 1.2G VIAL",
    "SALBUTAMOL: 2 NEBULES 2.5MG/2.5ML",
    "PARACETAMOL 500MG TAB #100",
    "OMEPRAZOLE 20 MG CAPSULE, DELAYED RELEASE",
    # ---- round-8 adversarial expansion: decimal commas, gram-unit
    #      strengths, dose ranges, pack multipliers, parenthesized
    #      strengths, per-actuation doses, leading noise prefixes,
    #      repeated tokens, spaced-slash combos, accented input
    "PARACETAMOL 0.5 G TABLET",
    "PARACETAMOL 0,5G TAB",
    "LEVOTHYROXINE 50UG TAB",
    "PARACETAMOL 500-650MG TAB",
    "PARACETAMOL 500MG X 100 TABLETS",
    "AMOXICILLIN (500MG) CAPSULE",
    "SALBUTAMOL 100MCG/ACTUATION INHALER",
    "LOSARTAN 50MG/ TAB",
    "amLODIPine  5 Mg Tab",
    "NSS 500 ML",
    "TYLENOL 500MG CAPLET BOTTLE OF 50",
    "LAMIVUDINE/ZIDOVUDINE 150/300 MG TAB",
    "ITEM: PARACETAMOL 500MG TAB",
    "PARACETAMOL PARACETAMOL 500MG TAB",
    "PARACÉTAMOL 500MG TAB",
    "VITAMIN B12 1MG AMPULE",
]


def write_csv(name, header, rows):
    with open(OUT / name, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(header)
        w.writerows(rows)


def name_key(s):
    return "".join(c for c in s.lower() if c.isalnum() or c == " ")


write_csv("unified_generics.csv", ["drugbank_id", "generic_name", "name_key", "source"],
          [(d, g, name_key(g), s) for d, g, s in GENERICS])
write_csv("unified_atc.csv", ["drugbank_id", "generic_name", "atc_code"],
          [("", g, a) for g, a in ATC])
write_csv("unified_brands.csv", ["brand_name", "generic_name"], BRANDS)
# table-driven synonyms (tagger.py:216-229): PENICILLIN G resolves to
# BENZYLPENICILLIN only through this table
write_csv("unified_synonyms.csv", ["drugbank_id", "generic_name", "synonyms"],
          [("DB01053", "BENZYLPENICILLIN", "PENICILLIN G|BENZYL PENICILLIN"),
           ("DB00512", "CETIRIZINE", "CETIRIZINA")])
write_csv("unified_mixtures.csv",
          ["drugbank_id", "mixture_name", "component_generics", "component_keys",
           "component_key", "component_count"], MIXTURES)
write_csv("texts.csv", ["id", "text"], list(enumerate(TEXTS, start=1)))

# ---------------------------------------------------------------- run reference
import pandas as pd  # noqa: E402

tagger = tagger_mod.UnifiedTagger(outputs_dir=OUT, inputs_dir=OUT, verbose=True)
tagger.load()
print(f"synonyms={len(tagger.synonyms)} brand_map={tagger.brand_map} "
      f"multiword={len(tagger.multiword_generics)}")
df = pd.DataFrame({"id": range(1, len(TEXTS) + 1), "text": TEXTS})
res = tagger.tag_descriptions(df, text_column="text", id_column="id")

NULL = "<NULL>"
LIST_COLS = {"dose_values", "dose_units", "dose_types"}
GOLDEN_COLS = [
    "id", "input_text", "atc_code", "drugbank_id", "generic_name",
    "reference_text", "dose", "form", "route", "type_details",
    "release_details", "form_details", "match_score", "match_reason",
    "sources", "salt_details", "brand_details", "indication_details",
    "alias_details", "diluent_details", "iv_diluent_type",
    "iv_diluent_amount", "dose_values", "dose_units", "dose_types",
    "total_volume_ml", "drug_amount_mg", "diluent_amount_mg",
    "concentration_mg_per_ml",
]


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


rows = []
for rec in res.to_dict("records"):
    rows.append([ser(c, rec.get(c)) for c in GOLDEN_COLS])
write_csv("golden.csv", GOLDEN_COLS, rows)
print(f"golden rows: {len(rows)} -> {OUT}/golden.csv")
for r in rows[:999]:
    print(dict(zip(["id", "text", "generic", "reason", "score"],
                   [r[0], r[1], r[4], r[13], r[12]])))
