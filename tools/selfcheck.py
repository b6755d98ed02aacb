#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: selfcheck.py <sfDir> <verifyOutDir>

For every query dumped by graft.Verify: run its oracle SQL in DuckDB (corpus
tables registered as views over <sfDir>), load the Spark parquet result,
canonicalize both (column-name sort, row sort, floats rounded), and report
row/schema/value match. Strict by default so ulp-level drift is visible.
"""
import json
import os
import sys

import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame, round_dp: int) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype in (np.float64, np.float32):
            df[c] = df[c].astype(np.float64).round(round_dp)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)
    return df


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    round_dp = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Honor the same subset selector graft.Verify uses, so a partial dump
    # (e.g. scripts/submit-smoke.sh) checks only what was produced. Loud
    # and strict: unknown names are an error and an empty selection exits
    # nonzero, so a stale/typo'd env var can't make the check pass
    # vacuously.
    only = os.environ.get("SPARK_GRAFT_ONLY")
    if only:
        names = {n.strip() for n in only.split(",") if n.strip()}
        unknown = sorted(names - oracle.keys())
        if unknown:
            sys.exit(f"SPARK_GRAFT_ONLY names not in oracle_sql.json: "
                     f"{', '.join(unknown)}")
        oracle = {k: v for k, v in oracle.items() if k in names}
        if not oracle:
            sys.exit("SPARK_GRAFT_ONLY selected zero queries")
        print(f"SPARK_GRAFT_ONLY: checking {len(oracle)} selected queries")
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp_c, got_c = canon(exp, round_dp), canon(got, round_dp)
            problems = []
            if list(exp_c.columns) != list(got_c.columns):
                problems.append(f"cols exp={list(exp_c.columns)} got={list(got_c.columns)}")
            elif len(exp_c) != len(got_c):
                problems.append(f"rows exp={len(exp_c)} got={len(got_c)}")
            else:
                for c in exp_c.columns:
                    e, g = exp_c[c], got_c[c]
                    if e.dtype == np.float64 or g.dtype == np.float64:
                        both_nan = e.isna() & g.isna()
                        eq = both_nan | (np.isclose(e.fillna(0), g.fillna(0),
                                                    rtol=0, atol=10.0**-round_dp / 2)
                                         & ~(e.isna() ^ g.isna()))
                    else:
                        eq = (e.astype(str).fillna("<null>")
                              == g.astype(str).fillna("<null>"))
                    if not eq.all():
                        i = int(np.argmin(eq.values))
                        problems.append(
                            f"col {c}: {int((~eq).sum())} diffs, first@{i}: "
                            f"exp={e.iloc[i]!r} got={g.iloc[i]!r}")
                # dtype check (schema match)
                for c in exp_c.columns:
                    if str(exp_c[c].dtype) != str(got_c[c].dtype):
                        problems.append(
                            f"dtype {c}: exp={exp_c[c].dtype} got={got_c[c].dtype}")
            if problems:
                fail += 1
                print(f"FAIL {name}")
                for p in problems[:4]:
                    print(f"     {p}")
            else:
                ok += 1
                print(f"ok   {name} ({len(exp_c)} rows)")
        except Exception as e:
            fail += 1
            print(f"ERR  {name}: {str(e)[:300]}")
    print(f"\n{ok} ok, {fail} fail")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
