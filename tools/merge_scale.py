#!/usr/bin/env python3
"""Merge per-session ScaleBench outputs + Repeat envelopes into BENCH_SCALE.json.

The host has documented noisy-neighbor windows (whole-JVM slowdowns with
no code change), so single-session curves are not trustworthy: the
committed artifact records per-factor MIN across sessions as the curve
and keeps every session's raw numbers alongside.

Usage:
  python3 tools/merge_scale.py BENCH_SCALE.json session1.json [session2.json ...] \
      [--repeat repeat_q26.jsonl]
"""
import json
import sys

args = sys.argv[1:]
repeat_path = None
if "--repeat" in args:
    i = args.index("--repeat")
    repeat_path = args[i + 1]
    args = args[:i] + args[i + 2:]
out_path, session_paths = args[0], args[1:]

with open(out_path) as f:
    merged = json.load(f)
merged.setdefault("queries", {})
merged["stat"] = "per-factor min across sessions; raw sessions recorded"

for sp in session_paths:
    with open(sp) as f:
        sess = json.load(f)
    factors = sess["factors"]
    for q, row in sess["queries"].items():
        entry = merged["queries"].setdefault(q, {"sec": {}, "sessions": {}})
        sessions = entry.setdefault("sessions", {})
        for n in factors:
            t = row["sec"][str(n)]
            sessions.setdefault(str(n), []).append(t)
            cur = entry["sec"].get(str(n))
            entry["sec"][str(n)] = t if (cur is None or (0 < t < cur)) else cur
        # recompute the slope key from the merged mins over the FULL
        # merged factor span (a partial session, e.g. an x8/x16 re-time,
        # must not shrink the baseline to its own first factor)
        span = sorted(int(n) for n in entry["sec"])
        lo, hi = span[0], span[-1]
        tlo, thi = entry["sec"].get(str(lo), -1), entry["sec"].get(str(hi), -1)
        if tlo and thi and tlo > 0 and thi > 0:
            entry.pop(f"x{factors[-1]}_vs_linear", None)
            entry[f"x{hi}_vs_linear"] = round((thi / tlo) / (hi / lo), 3)

if repeat_path:
    sessions = []
    with open(repeat_path) as f:
        for line in f:
            line = line.strip()
            if line:
                sessions.append(json.loads(line))
    # group by the session's query field — a jsonl that accumulates
    # repeats for several queries must yield one envelope block per
    # query, not silently merge every session under the first query's key
    by_query = {}
    for s in sessions:
        by_query.setdefault(s["query"], []).append(s)
    for qname, qsessions in by_query.items():
        mins = [s["min"] for s in qsessions]
        # key the envelope by the query's short prefix (q26_repeat,
        # q80_repeat, ...) so each expensive query keeps its own block
        key = qname.split("_")[0] + "_repeat"
        merged[key] = {
            "query": qname,
            "k": qsessions[0]["k"],
            "sessions": qsessions,
            "cross_session_min_ratio": round(max(mins) / min(mins), 3),
            "note": ("min-of-10 per session; runs above ~1.5x min sit in "
                     "documented noisy-neighbor windows (all tasks "
                     "uniformly slow, near-zero GC — see tools/Repeat "
                     "scaladoc)"),
        }

with open(out_path, "w") as f:
    json.dump(merged, f, indent=1)
    f.write("\n")
print(f"merged {len(session_paths)} session file(s) into {out_path}")
