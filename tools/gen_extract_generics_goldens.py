#!/usr/bin/env python3
"""Generate extract_generic_tokens goldens by exec'ing the reference
tokenizer module (tokenizer.py) with unified_constants loaded standalone.
"""
import importlib.util
import sys

spec = importlib.util.spec_from_file_location(
    "unified_constants",
    "/root/reference/pipelines/drugs/scripts/unified_constants.py")
uc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(uc)
sys.modules["unified_constants"] = uc

src = open("/root/reference/pipelines/drugs/scripts/tokenizer.py").read()
src = src.replace("from .unified_constants import", "from unified_constants import")
ns = {"__name__": "tokenizer"}
exec(compile(src, "tokenizer.py", "exec"), ns)
extract = ns["extract_generic_tokens"]
MWG = uc.MULTIWORD_GENERICS

cases = [
    "PARACETAMOL 500MG TABLET",
    "IBUPROFEN+PARACETAMOL 200MG/325MG TAB",
    "AMOXICILLIN + CLAVULANIC ACID 625MG TABLET",
    "ALUMINUM HYDROXIDE + MAGNESIUM HYDROXIDE 225MG TABLET",
    "DEXAMETHASONE SODIUM PHOSPHATE 4MG/ML INJECTION",
    "5% DEXTROSE IN 0.9% SODIUM CHLORIDE 500 ML",
    "DEXTROSE IN WATER 5% 250ML",
    "SODIUM CHLORIDE 0.9% SOLUTION 1L",
    "0.9% SODIUM CHLORIDE 500ML BOTTLE",
    "ALENDRONATE + CHOLECALCIFEROL (VIT. D3) ( as SODIUM SALT)",
    "AMLODIPINE ( as BESILATE) 5MG TABLET",
    "ZINC 10MG TABLET",
    "ZINC + VITAMIN C 500MG",
    "CEFTRIAXONE 1G VIAL + DILUENT 10ML",
    "CAPSULE SOFT GELATIN VITAMIN E 400IU",
    "PARACETAMOL 250MG/5ML SYRUP 60ML",
    "LACTATED RINGER'S SOLUTION 1L",
    "CO-AMOXICLAV 625MG TABLET",
    "SURGICAL GLOVES SIZE 7",
    "CLARITHROMYCIN 500 MG TABLET **",
    "AMINO ACID SOLUTIONS FOR HEPATIC FAILURE",
    "POTASSIUM CHLORIDE 600MG DURULES",
    "SALBUTAMOL + IPRATROPIUM NEBULE",
    "INSULIN HUMAN REGULAR 100IU/ML",
    "VITAMIN B COMPLEX TABLET",
    "FERROUS SULFATE + FOLIC ACID TABLET",
    "MAGNESIUM SULFATE 250MG/ML INJECTION",
    "OMEPRAZOLE 20MG CAPSULE, DELAYED RELEASE",
    "PHENOXYMETHYLPENICILLIN POTASSIUM 250MG",
    "DEXTROSE 5% IN LACTATED RINGER'S 1L",
    "HYDROCORTISONE SODIUM SUCCINATE 100MG VIAL",
    "MULTIVITAMINS + IRON SYRUP 120ML",
    "TRIMETHOPRIM + SULFAMETHOXAZOLE 160MG/800MG TABLET",
    "GENTAMICIN 40MG/ML 2ML AMPULE",
]

def enc_list(xs):
    return "\x01".join(xs) if xs else ""

with open("src/test/resources/extract_generics_goldens.tsv", "w") as f:
    f.write("input\ttokens\tgenerics\n")
    for c in cases:
        toks, gens = extract(c, MWG)
        f.write(f"{c}\t{enc_list(toks)}\t{enc_list(gens)}\n")
        print(repr(c), "->", gens)
