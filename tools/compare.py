#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff rows/schema/values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def values_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        sql = oracle[name]
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            n_fail += 1
            continue
        exp, got = canon(exp), canon(got)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns oracle={list(exp.columns)} spark={list(got.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows oracle={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        mism = 0
        for c in exp.columns:
            ev, gv = exp[c].tolist(), got[c].tolist()
            bad = [(i, a, b) for i, (a, b) in enumerate(zip(ev, gv)) if not values_equal(a, b)]
            if bad:
                mism += len(bad)
                i, a, b = bad[0]
                print(f"  {name}.{c}: {len(bad)} mismatches, first at row {i}: oracle={a!r} spark={b!r}")
        if mism:
            print(f"FAIL {name}: {mism} value mismatches ({len(exp)} rows)")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
