#!/usr/bin/env python3
"""Generate forms_compatible / route_matches goldens by exec'ing the
reference closures (runners.py:1195-1341) with unified_constants injected.
Dev tool only; output TSVs live in src/test/resources/.
"""
import importlib.util
import itertools
import textwrap

spec = importlib.util.spec_from_file_location(
    "unified_constants",
    "/root/reference/pipelines/drugs/scripts/unified_constants.py")
uc = importlib.util.module_from_spec(spec)
spec.loader.exec_module(uc)

src = open("/root/reference/pipelines/drugs/scripts/runners.py").read().splitlines()
# closures: forms_compatible (1195-1296), route_matches (1298-1341); slice
# by def markers to stay robust to small drift
start_f = next(i for i, l in enumerate(src) if "def forms_compatible(" in l)
start_r = next(i for i, l in enumerate(src) if "def route_matches(" in l)
end_r = next(i for i in range(start_r + 1, len(src))
             if src[i].strip().startswith("# STRICT MATCHING"))
code = textwrap.dedent("\n".join(src[start_f:end_r]))
ns = {"FORM_EQUIVALENTS": uc.FORM_EQUIVALENTS,
      "FORM_TO_ROUTES": uc.FORM_TO_ROUTES}
exec(code, ns)
forms_compatible = ns["forms_compatible"]
route_matches = ns["route_matches"]

def enc(v):
    return "\\N" if v is None else v

forms = [None, "", "TABLET", "TAB", "CAPSULE", "CAPLET", "AMPULE", "AMPOULE",
         "VIAL", "INJECTION", "BOTTLE", "SOLUTION", "SYRUP", "SUSPENSION",
         "DROPS", "NEBULE", "INHALER", "AEROSOL", "CREAM", "OINTMENT",
         "POWDER", "SACHET", "GRANULE", "TABLET, FILM COATED",
         "SOLUTION FOR INJECTION", "LYOPHILIZED POWDER", "PREFILLED SYRINGE",
         "XYZFORM", "SUPPOSITORY", "PATCH"]
routes = [None, "", "ORAL", "PO", "IV", "INTRAVENOUS", "IM", "INTRAMUSCULAR",
          "SC", "SQ", "PARENTERAL", "TOPICAL", "CUTANEOUS", "INHALATION",
          "NEBULIZATION", "OPHTHALMIC", "EYE", "RECTAL", "PR", "NASAL",
          "OTIC", "VAGINAL", "SUBLINGUAL", "XYZROUTE"]

with open("src/test/resources/forms_compatible_goldens.tsv", "w") as f:
    f.write("cand_form\tesoa_form\tcand_route\tesoa_route\tcompatible\n")
    # all form pairs with no route context
    for cf, ef in itertools.product(forms, forms):
        f.write(f"{enc(cf)}\t{enc(ef)}\t\\N\t\\N\t{str(forms_compatible(cf, ef)).lower()}\n")
    # route-constrained: a spread of form pairs x route pairs
    route_forms = ["TABLET", "AMPULE", "VIAL", "SOLUTION", "NEBULE", "CREAM",
                   "POWDER", "XYZFORM", "SOLUTION FOR INJECTION"]
    route_sel = [None, "", "ORAL", "IV", "PARENTERAL", "IM", "TOPICAL",
                 "NEBULIZATION", "XYZROUTE"]
    for cf, ef, cr, er in itertools.product(route_forms, route_forms,
                                            route_sel, route_sel):
        f.write(f"{enc(cf)}\t{enc(ef)}\t{enc(cr)}\t{enc(er)}\t"
                f"{str(forms_compatible(cf, ef, cr, er)).lower()}\n")

with open("src/test/resources/route_matches_goldens.tsv", "w") as f:
    f.write("cand_route\tesoa_route\tmatch\n")
    for cr, er in itertools.product(routes, routes):
        f.write(f"{enc(cr)}\t{enc(er)}\t{str(route_matches(cr, er)).lower()}\n")

print("forms cases:", len(forms)**2 + len(route_forms)**2 * len(route_sel)**2)
print("route cases:", len(routes)**2)
