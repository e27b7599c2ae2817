#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <out>/<name> parquet (Spark result), runs the matching
oracle_sql.json entry in DuckDB over views of the sfDir tables, sorts
columns by name and rows by value, and compares cell-by-cell (exact,
including float bits) — a conservative emulation of the driver's
row/schema/hash match.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return [sorted(cols)] + out

def main():
    sf, out = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')")
            spark_cols = spark_rel.columns
            spark_rows = spark_rel.fetchall()
            duck_rel = con.sql(sql)
            duck_cols = duck_rel.columns
            duck_rows = duck_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        a, b = canon(spark_rows, spark_cols), canon(duck_rows, duck_cols)
        if a == b:
            print(f"PASS {name} ({len(spark_rows)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}")
            if a[0] != b[0]:
                print(f"  cols spark={a[0]}\n  cols duck ={b[0]}")
            else:
                shown = 0
                for i in range(max(len(a), len(b))):
                    ra = a[i] if i < len(a) else None
                    rb = b[i] if i < len(b) else None
                    if ra != rb and shown < 5:
                        print(f"  spark[{i}]={ra}\n  duck [{i}]={rb}")
                        shown += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
