#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: oracle_check.py <sfDir> <sparkOutDir> <name> [<name>...]
Reads the oracle SQL from the Scala source via Verify's oracle_sql.json
if present in <sparkOutDir>, else expects dev/oracle_<name>.sql.
Compares rows/schema/values after sorting columns by name and rows by
all values (the driver's hash compare, minus the hashing).
"""
import sys, json, os
import duckdb

def main():
    sf, out = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    sqls = {}
    osql = os.path.join(out, "oracle_sql.json")
    if os.path.exists(osql):
        sqls = json.load(open(osql))
    ok = True
    for name in names:
        sql = sqls.get(name)
        if sql is None:
            path = f"dev/oracle_{name}.sql"
            if os.path.exists(path):
                sql = open(path).read()
            else:
                print(f"{name}: NO ORACLE SQL")
                ok = False
                continue
        spark = con.execute(
            f"SELECT * FROM '{out}/{name}/*.parquet'").fetchdf()
        oracle = con.execute(sql).fetchdf()
        scols = sorted(spark.columns)
        ocols = sorted(oracle.columns)
        if scols != ocols:
            print(f"{name}: SCHEMA MISMATCH spark={scols} oracle={ocols}")
            ok = False
            continue
        if len(spark) != len(oracle):
            print(f"{name}: ROWS MISMATCH spark={len(spark)} oracle={len(oracle)}")
            ok = False
            continue
        s = spark[scols].sort_values(scols).reset_index(drop=True)
        o = oracle[ocols].sort_values(ocols).reset_index(drop=True)
        mism = 0
        for c in scols:
            sv, ov = s[c].tolist(), o[c].tolist()
            for i, (a, b) in enumerate(zip(sv, ov)):
                if a != b and str(a) != str(b):
                    if mism < 5:
                        print(f"{name}: col {c} row {i}: spark={a!r} oracle={b!r}")
                    mism += 1
        if mism:
            print(f"{name}: VALUE MISMATCH ({mism} cells)")
            ok = False
        else:
            print(f"{name}: OK ({len(spark)} rows)")
    sys.exit(0 if ok else 1)

main()
