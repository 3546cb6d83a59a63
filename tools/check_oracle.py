#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare.

Usage: python tools/check_oracle.py <sfdir> <verify_out_dir>
Reads each <out>/<query>/ parquet (Spark result) and runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the sfdir tables;
compares schema (column names sorted), row count, and values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(outdir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            results[name] = "NO_SPARK_OUTPUT"
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        if name not in oracles:
            results[name] = f"ROWS_ONLY({len(spark_df)})"
            continue
        try:
            oracle_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        s, o = norm(spark_df), norm(oracle_df)
        if list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA_MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
            continue
        if len(s) != len(o):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(s)} oracle={len(o)}"
            continue
        try:
            pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            results[name] = f"MATCH({len(s)})"
        except AssertionError as e:
            results[name] = "VALUE_MISMATCH: " + str(e).split("\n")[0]
            # show first differing rows
            diff = (s != o) & ~(s.isna() & o.isna())
            rows = diff.any(axis=1)
            if rows.any():
                i = rows.idxmax()
                results[name] += f" | first diff row {i}: spark={s.loc[i].to_dict()} oracle={o.loc[i].to_dict()}"
    ok = sum(1 for v in results.values() if v.startswith("MATCH") or v.startswith("ROWS_ONLY"))
    for k in sorted(results):
        print(f"{'OK ' if results[k].startswith(('MATCH','ROWS_ONLY')) else 'BAD'} {k}: {results[k]}")
    print(f"\n{ok}/{len(results)} ok")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
