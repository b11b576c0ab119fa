#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/oracle_check.py [sfDir] [outDir]

Reads each parquet result written by `graft.Verify` from outDir/<name>/,
runs the matching SQL from outDir/oracle_sql.json in DuckDB against views
over sfDir/*.parquet, and compares: row count, column names, COLUMN TYPES
(the driver's hash covers typed values — an uncast DuckDB SUM(BIGINT)
coming back HUGEINT fails there even when the Python ints compare equal,
which is exactly how pp14 shipped red in round 10), and values (rows
sorted, NaN-safe, exact after the query's own rounding).
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # collapse -0.0 / 0.0 and format compactly
        return ("f", repr(v + 0.0))
    if isinstance(v, (list, tuple)):
        return ("l",) + tuple(norm(x) for x in v)
    return (type(v).__name__[:1], str(v))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            spark_cols = [c.lower() for c in spark_rel.columns]
            spark_rows = spark_rel.fetchall()
            oracle_rel = con.sql(sql)
            oracle_cols = [c.lower() for c in oracle_rel.columns]
            oracle_rows = oracle_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: error {str(e).splitlines()[0][:200]}")
            n_fail += 1
            continue
        if sorted(spark_cols) != sorted(oracle_cols):
            print(f"FAIL {name}: cols spark={spark_cols} oracle={oracle_cols}")
            n_fail += 1
            continue
        # storage-type check, aligned by column name (mirrors the driver's
        # typed hash): BIGINT vs HUGEINT etc. must FAIL here, not only there
        s_types = dict(zip(spark_cols, (str(t) for t in spark_rel.types)))
        o_types = dict(zip(oracle_cols, (str(t) for t in oracle_rel.types)))
        type_skew = {c: (s_types[c], o_types[c])
                     for c in spark_cols if s_types[c] != o_types[c]}
        if type_skew:
            print(f"FAIL {name}: column type skew (spark, oracle): {type_skew}")
            n_fail += 1
            continue
        # align column order by name, then sort rows
        s_idx = [spark_cols.index(c) for c in sorted(spark_cols)]
        o_idx = [oracle_cols.index(c) for c in sorted(oracle_cols)]
        s = sorted(tuple(norm(r[i]) for i in s_idx) for r in spark_rows)
        o = sorted(tuple(norm(r[i]) for i in o_idx) for r in oracle_rows)
        if len(s) != len(o):
            print(f"FAIL {name}: rows spark={len(s)} oracle={len(o)}")
            n_fail += 1
        elif s != o:
            diffs = [i for i, (a, b) in enumerate(zip(s, o)) if a != b]
            i = diffs[0]
            print(f"FAIL {name}: {len(diffs)}/{len(s)} rows differ; first at {i}:")
            print(f"  spark : {s[i]}")
            print(f"  oracle: {o[i]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
