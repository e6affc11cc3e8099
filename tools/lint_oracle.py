#!/usr/bin/env python3
"""Oracle output-dtype lint.

The driver's correctness hash is dtype-sensitive: a DuckDB oracle whose
final SELECT emits a type Spark cannot produce (HUGEINT from sum(INTEGER),
unsigned ints, ...) hash-mismatches even when every value is identical.
This silently cost q129 three rounds of red (r11-r13) and one wrong
diagnosis before the dtype sweep found it.

Rule (also documented in SparkEntry.scala's header and SCALING.md):
every DuckDB integer `sum()` / conditional-count in a final SELECT must
be CAST(... AS BIGINT); no oracle output column may have a type outside
Spark's surface.

Usage: python3 tools/lint_oracle.py <sfDir> <oracle_sql.json>
Runs each oracle as `SELECT * FROM (...) LIMIT 0` (schema-only, fast)
against parquet views and fails on any banned output type.
"""
import json, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Types Spark has no equivalent for (or that pandas widens differently):
# HUGEINT/UHUGEINT are INT128; the U* family is unsigned. Any of these in
# an oracle's output schema guarantees a driver hash mismatch.
BANNED = {"HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER", "USMALLINT",
          "UTINYINT", "TIME", "INTERVAL", "UUID", "BIT"}


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(oracle_path))
    n_bad = 0
    for name in sorted(oracle):
        try:
            rel = con.sql(f"SELECT * FROM ({oracle[name]}) __lint LIMIT 0")
            bad = [(c, str(ty)) for c, ty in zip(rel.columns, rel.types)
                   if str(ty).split("(")[0].upper() in BANNED]
        except Exception as e:
            print(f"FAIL {name}: oracle error during lint: {e}")
            n_bad += 1
            continue
        if bad:
            cols = ", ".join(f"{c}:{ty}" for c, ty in bad)
            print(f"FAIL {name}: non-Spark-representable output column(s): {cols}")
            n_bad += 1
    print(f"{len(oracle) - n_bad} clean / {n_bad} flagged of {len(oracle)} oracles")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
