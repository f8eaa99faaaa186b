#!/usr/bin/env python3
"""Generate parse_combo_dose component goldens by exec'ing the reference
closure (runners.py:428-544). Output TSV in src/test/resources/.
"""
import importlib.util
import re
import textwrap

spec = importlib.util.spec_from_file_location(
    "unified_constants",
    "/root/reference/pipelines/drugs/scripts/unified_constants.py")
uc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(uc)

src = open("/root/reference/pipelines/drugs/scripts/runners.py").read().splitlines()
start = next(i for i, l in enumerate(src) if "def parse_combo_dose(" in l)
end = next(i for i in range(start + 1, len(src))
           if src[i].strip().startswith("def parse_dose_to_mg"))
code = textwrap.dedent("\n".join(src[start:end]))

class _pd:
    @staticmethod
    def isna(x):
        return x is None
UNIT_TO_MG = {"MG": 1.0, "G": 1000.0, "GM": 1000.0, "GRAM": 1000.0, "MCG": 0.001, "UG": 0.001, "MICROGRAM": 0.001, "KG": 1000000.0}
ns = {"re": re, "pd": _pd, "UNIT_TO_MG": UNIT_TO_MG}
exec(code, ns)
f = ns["parse_combo_dose"]

cases = [
    "500MG+125MG", "500MG/125MG", "250|MG|125", "400|MG|57|ML|35",
    "250|MG|1|G", "875MG+125MG", "4MG+500MG", "500 MG + 125 MG",
    "100MG/5ML", "457MG/5ML", "500MG", "1G+500MG", "250|MG|62.5",
    "200|MG|28.5|ML|70", "1000|MG|200", "500|MG|2|G", "120MG/5ML 60ML",
    "80MG+400MG+100MG", "5MG/25MG", "0.5G/0.25G", "250MCG+50MCG",
    "600|MG|42.9|ML|75", "500|MG|125|MG", "300|MG|150", "", None,
]

def enc(v):
    return "\\N" if v is None else v

with open("src/test/resources/combo_dose_goldens.tsv", "w") as out:
    out.write("input\tcomponents\ttotal\tbottle_vol\n")
    for c in cases:
        comps, total, vol = f(c)
        comps_s = "\\N" if comps is None else "|".join(str(x) for x in comps)
        total_s = "\\N" if total is None else str(total)
        vol_s = "\\N" if vol is None else str(vol)
        out.write(f"{enc(c)}\t{comps_s}\t{total_s}\t{vol_s}\n")
        print(repr(c), "->", comps, total, vol)
