#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs graft.Verify output (parquet per query) against each oracle SQL in
DuckDB over the same testdata dir, sorts columns by name + rows by value,
and value-compares. Dev tool only — the shipped Scala library has no
Python dependency.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import math

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def dtypes_equal(a, b) -> bool:
    # The driver's hash is dtype-sensitive across FAMILIES (int64 vs float64
    # of identical values fails — round-1 q01/q32/q60), but width-insensitive
    # within a family (Spark int32 vs DuckDB int64 passed the round-1 hash on
    # q09/q15/q16/q30-q32/q35/q40/q41/q50). Mirror that: compare the pandas
    # dtype KIND (i/u one family, f, b, O/string one family), not the width.
    sa, sb = str(a), str(b)
    stringish = {"object", "string", "large_string[pyarrow]", "string[pyarrow]"}
    if sa in stringish and sb in stringish:
        return True
    ka = getattr(a, "kind", "?")
    kb = getattr(b, "kind", "?")
    int_kinds = {"i", "u"}
    if ka in int_kinds and kb in int_kinds:
        return True
    return ka == kb


def values_equal(a, b) -> bool:
    if a is b:
        return True
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            fa, fb = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb  # exact: engine must be bit-deterministic
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
        duck_df = canon(con.execute(oracle[name]).df())
        ok = True
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} "
                  f"vs {list(duck_df.columns)}")
            ok = False
        elif any(not dtypes_equal(spark_df[c].dtype, duck_df[c].dtype)
                 for c in spark_df.columns):
            bad = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
                   for c in spark_df.columns
                   if not dtypes_equal(spark_df[c].dtype, duck_df[c].dtype)]
            print(f"FAIL {name}: dtype mismatch {bad}")
            ok = False
        elif len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            ok = False
        else:
            for c in spark_df.columns:
                bad = [i for i in range(len(spark_df))
                       if not values_equal(spark_df[c].iloc[i],
                                           duck_df[c].iloc[i])]
                if bad:
                    i = bad[0]
                    print(f"FAIL {name}: col {c} {len(bad)} diffs, first at "
                          f"row {i}: spark={spark_df[c].iloc[i]!r} "
                          f"duck={duck_df[c].iloc[i]!r}")
                    ok = False
                    break
        if ok:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
