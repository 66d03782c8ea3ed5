#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads the parquet dumps that `graft.Verify` wrote to outDir, runs each
oracle SQL from outDir/oracle_sql.json in DuckDB against the same sfDir
tables, and compares (schema-insensitively: columns sorted by name,
values compared cell-by-cell). Exit 1 on any mismatch.

Driver-side tooling only — the engine itself is the Scala library.
"""
import sys, os, json, math
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{out}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output dir")
        fail += 1
        continue
    try:
        spark_df = con.sql(f"SELECT * FROM '{pdir}/*.parquet'").df()
        duck_df = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fail += 1
        continue
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
        fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
        fail += 1
        continue
    bad = None
    for c in s.columns:
        sv, dv = list(s[c]), list(d[c])
        for i, (a, b) in enumerate(zip(sv, dv)):
            an = a is None or (isinstance(a, float) and math.isnan(a))
            bn = b is None or (isinstance(b, float) and math.isnan(b))
            if an and bn:
                continue
            if an != bn or str(a) != str(b):
                bad = (c, i, a, b)
                break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i}: spark={a!r} duck={b!r}")
        fail += 1
    else:
        print(f"OK   {name} ({len(s)} rows, {len(s.columns)} cols)")

print(f"\n{len(oracle) - fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)
