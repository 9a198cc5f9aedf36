#!/usr/bin/env python3
"""Local approximation of the driver's DuckDB oracle gate.

Usage: oracle_check.py <sfDir> <verifyOutDir>
Compares each <name>.parquet (Spark result) against the oracle SQL in
oracle_sql.json run by DuckDB over the sfDir tables. Sorts columns by
name, rows by all values, and hash-compares.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
# Queries intentionally declared without an oracle (non-SQL-expressible);
# anything else missing from oracle_sql.json is treated as a failure so a
# typo'd or dropped entry can't silently weaken the gate.
ALLOW_ROWS_ONLY = set()
fail = 0
rows_only = []
for name in sorted(os.listdir(out)):
    d = os.path.join(out, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(d + "/*.parquet")
    spark_df = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        print(f"{name}: rows-only ({len(spark_df)} rows)")
        if name not in ALLOW_ROWS_ONLY:
            rows_only.append(name)
        continue
    try:
        odf = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR {e}")
        fail += 1
        continue
    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            if df[c].dtype == object:
                df[c] = df[c].astype(str)
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
        return df
    s, o = canon(spark_df), canon(odf)
    rows_ok = len(s) == len(o)
    schema_ok = list(s.columns) == list(o.columns)
    hash_ok = False
    if rows_ok and schema_ok:
        try:
            # pandas < 2.1 lacks DataFrame.map (elementwise was applymap)
            cellmap = getattr(pd.DataFrame, "map", pd.DataFrame.applymap)
            rnd = lambda v: round(v, 6) if isinstance(v, float) else v
            hash_ok = cellmap(s, rnd).astype(str).equals(
                cellmap(o, rnd).astype(str))
        except Exception:
            hash_ok = False
    status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
    if status == "FAIL":
        fail += 1
        print(f"{name}: {status} rows={len(s)}/{len(o)} schema={schema_ok} cols_s={list(s.columns)} cols_o={list(o.columns)}")
    else:
        print(f"{name}: OK ({len(s)} rows)")
if rows_only:
    print(f"WARN: {len(rows_only)} queries lack oracle entries: {rows_only}")
sys.exit(1 if (fail or rows_only) else 0)
