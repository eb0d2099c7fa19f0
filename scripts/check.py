#!/usr/bin/env python3
"""Dev-side self-check mirroring the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark side), runs the matching
oracle_sql.json entry in DuckDB over the same parquet tables, then
compares rows / schema (column names sorted) / a value hash. Queries
without an oracle entry get a rows>0 check only. Dev tool only — the
shipped Scala code never depends on this.
"""
import sys, json, glob, hashlib
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    import datetime
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(col).dt.strftime("%Y-%m-%d %H:%M:%S")
        elif col.dtype == object and len(col) and isinstance(
                col.dropna().iloc[0] if len(col.dropna()) else None,
                (datetime.date, datetime.datetime)):
            df[c] = pd.to_datetime(col).dt.strftime("%Y-%m-%d %H:%M:%S")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def value_hash(df: pd.DataFrame) -> str:
    rows = []
    for tup in df.itertuples(index=False):
        cells = []
        for v in tup:
            if isinstance(v, float):
                # Full precision: every query round()s its floats
                # upstream, so Spark and DuckDB produce bit-identical
                # doubles — 6 sig digits would false-PASS cents on
                # million-scale sums.
                cells.append(f"{v:.17g}")
            else:
                cells.append(str(v))
        rows.append("|".join(cells))
    return hashlib.md5("\n".join(rows).encode()).hexdigest()

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    import os
    if os.path.exists(f"{out_dir}/_NARROWED"):
        print("***** NARROWED SWEEP — this is NOT full-coverage "
              "evidence (see _NARROWED) *****")
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/*")
                   if os.path.isdir(d))
    n_pass = n_fail = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"{name}: NO SPARK OUTPUT"); n_fail += 1; continue
        sdf = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            ok = len(sdf) > 0
            print(f"{name}: rows-only {'PASS' if ok else 'FAIL (0 rows)'} ({len(sdf)} rows)")
            n_pass += ok; n_fail += (not ok); continue
        try:
            odf = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{name}: ORACLE SQL ERROR: {e}"); n_fail += 1; continue
        s, o = norm(sdf), norm(odf)
        problems = []
        if len(s) != len(o): problems.append(f"rows {len(s)} vs {len(o)}")
        if list(s.columns) != list(o.columns):
            problems.append(f"cols {list(s.columns)} vs {list(o.columns)}")
        elif len(s) == len(o) and value_hash(s) != value_hash(o):
            problems.append("hash mismatch")
            merged = s.compare(o) if s.shape == o.shape else None
            if merged is not None and not merged.empty:
                problems.append(f"first diffs:\n{merged.head(5)}")
        if len(s) == 0 and len(o) == 0:
            problems.append("VACUOUS (0 rows both sides)")
        if problems:
            print(f"{name}: FAIL — {'; '.join(str(p) for p in problems)}")
            n_fail += 1
        else:
            print(f"{name}: PASS ({len(s)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
