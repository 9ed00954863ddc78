#!/usr/bin/env python3
"""Local pre-flight for the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py [sfDir] [outDir]

Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already produced
per-query parquet dumps + oracle_sql.json. Registers the sf tables in
DuckDB, runs each oracle SQL, and compares row sets against the Spark
results (columns sorted by name, rows sorted, values stringified with
float rounding) — approximating the driver's hash compare.
"""
import json, math, sys
from pathlib import Path

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6g}"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in order) for r in rows)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    ok = fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = OUT / name
        if not res_dir.exists():
            print(f"MISSING  {name}: no Spark result dump")
            fail += 1
            continue
        spark_rel = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')")
        s_cols = [c.lower() for c in spark_rel.columns]
        s_rows = canon_rows(s_cols, spark_rel.fetchall())
        try:
            duck_rel = con.sql(sql)
            d_cols = [c.lower() for c in duck_rel.columns]
            d_rows = canon_rows(d_cols, duck_rel.fetchall())
        except Exception as e:
            print(f"SQLERR   {name}: {e}")
            fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"SCHEMA   {name}: spark={sorted(s_cols)} duck={sorted(d_cols)}")
            fail += 1
        elif s_rows != d_rows:
            diff_s = [r for r in s_rows if r not in d_rows][:3]
            diff_d = [r for r in d_rows if r not in s_rows][:3]
            print(f"ROWS     {name}: {len(s_rows)} spark vs {len(d_rows)} duck rows")
            print(f"         spark-only: {diff_s}")
            print(f"         duck-only:  {diff_d}")
            fail += 1
        else:
            print(f"OK       {name} ({len(s_rows)} rows)")
            ok += 1
    print(f"\n{ok} ok, {fail} failed")
    sys.exit(1 if fail else 0)


if __name__ == "__main__":
    main()
