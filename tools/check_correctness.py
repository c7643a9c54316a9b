#!/usr/bin/env python3
"""Dev-only harness mimicking the driver's t2 correctness gate.

Usage: python3 tools/check_correctness.py <verifyOutDir> [sfDir]

Reads each <verifyOutDir>/<name> parquet produced by `graft.Verify`,
runs the matching oracle SQL from <verifyOutDir>/oracle_sql.json in
DuckDB against the sfDir parquet tables, and compares schemas + sorted
rows. DuckDB/pyarrow here are dev tooling only — the engine itself has
no Python dependency.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    out_dir = Path(sys.argv[1])
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    oracle = json.loads((out_dir / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failed = []
    for name in sorted(p.name for p in out_dir.iterdir() if p.is_dir()):
        spark_rel = con.execute(
            f"SELECT * FROM '{out_dir / name}/*.parquet'")
        spark_cols = [d[0] for d in spark_rel.description]
        spark_rows = spark_rel.fetchall()
        if name not in oracle:
            print(f"  {name}: NO ORACLE (rows-only: {len(spark_rows)} rows)")
            continue
        try:
            duck_rel = con.execute(oracle[name])
            duck_cols = [d[0] for d in duck_rel.description]
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            failed.append(name)
            print(f"  {name}: ORACLE SQL ERROR: {e}")
            continue
        # driver sorts columns by name before hashing values
        s_idx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        d_idx = sorted(range(len(duck_cols)), key=lambda i: duck_cols[i])
        if sorted(spark_cols) != sorted(duck_cols):
            failed.append(name)
            print(f"  {name}: COLUMN MISMATCH spark={sorted(spark_cols)} "
                  f"duck={sorted(duck_cols)}")
            continue
        s = sorted(tuple(norm(r[i]) for i in s_idx) for r in spark_rows)
        d = sorted(tuple(norm(r[i]) for i in d_idx) for r in duck_rows)
        if s == d:
            print(f"  {name}: OK ({len(s)} rows)")
        else:
            failed.append(name)
            print(f"  {name}: ROW MISMATCH spark={len(s)} duck={len(d)}")
            for i, (a, b) in enumerate(zip(s, d)):
                if a != b:
                    print(f"    first diff at row {i}:\n      spark={a}\n      duck ={b}")
                    break
            else:
                if len(s) != len(d):
                    only_s = [r for r in s[:5] if r not in d[:50]]
                    print(f"    extra spark rows (sample): {only_s[:2]}")
    print(f"{'FAIL' if failed else 'PASS'}: "
          f"{len(failed)} failed of {len(oracle)} oracled queries")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
