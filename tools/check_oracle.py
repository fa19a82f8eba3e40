#!/usr/bin/env python3
"""Local self-check of SparkEntry.queries vs oracleSql (SURVEY.md §7.3).

Mimics the driver's t2 gate: run graft.Verify at a given sfDir, then run
every oracle SQL in DuckDB with the tables registered as views over the
same parquet, and compare (columns sorted by name, values normalized).

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
  (defaults: /root/testdata/sf0.01 /tmp/graft_verify)
Assumes `sbt "runMain graft.Verify <sfDir> <outDir>"` already ran.
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
    return df.reset_index(drop=True)

def cmp(name, spark_df, duck_df):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"COLS  spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS  spark={len(a)} duck={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = ((av.isna() & bv.isna()) | (av == bv)).all()
        else:
            ok = av.where(~av.isna(), None).equals(bv.where(~bv.isna(), None))
        if not ok:
            bad = (~((av.isna() & bv.isna()) | (av == bv))).idxmax()
            return (f"VAL   col={c} row={bad} "
                    f"spark={av.iloc[bad]!r} duck={bv.iloc[bad]!r}")
    return None

def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    # rows-only declared queries still must have produced output parquet
    import os
    produced = {d for d in os.listdir(out_dir)
                if os.path.isdir(f"{out_dir}/{d}")}
    for d in sorted(produced - set(oracle)):
        print(f"info {d}: rows-only (no oracle), output present")
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: no spark output ({e})"); n_bad += 1; continue
        try:
            duck_df = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}"); n_bad += 1; continue
        err = cmp(name, spark_df, duck_df)
        if err: print(f"FAIL {name}: {err}"); n_bad += 1
        else:   print(f"ok   {name} ({len(spark_df)} rows)"); n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
