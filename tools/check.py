#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> spark-written parquet, runs the matching
oracle SQL from oracle_sql.json in DuckDB (views named after the fixture
tables over <sfDir>), and compares: column names, dtypes, row count, and
exact values in order. Exit 1 if any declared query mismatches.
"""
import sys, os, json, glob
import warnings
warnings.filterwarnings("ignore")
import duckdb
import pandas as pd
import numpy as np

def norm_dates(df):
    import datetime
    for c in df.columns:
        if df[c].dtype == object and len(df) and isinstance(df[c].iloc[0], datetime.date)            and not isinstance(df[c].iloc[0], datetime.datetime):
            df[c] = pd.to_datetime(df[c])
        if str(df[c].dtype).startswith('datetime64'):
            df[c] = df[c].astype('datetime64[us]')
    return df

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    names = sorted(d for d in os.listdir(outdir)
                   if os.path.isdir(os.path.join(outdir, d)))
    # A query that THREW inside Verify writes no output dir and would be
    # invisible to the dir scan — merge in the declared manifest so a
    # missing output is a failure, not a silent skip.
    decl_path = os.path.join(outdir, "declared.json")
    if os.path.exists(decl_path):
        names = sorted(set(names) | set(json.load(open(decl_path))))
    fails, nooracle = [], []
    for name in names:
        if only and name not in only:
            continue
        if not os.path.isdir(os.path.join(outdir, name)):
            fails.append((name, "NO OUTPUT — query failed inside Verify")); continue
        files = sorted(glob.glob(os.path.join(outdir, name, "*.parquet")))
        if not files:
            fails.append((name, "no spark output")); continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            nooracle.append((name, len(spark_df)))
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            fails.append((name, f"oracle SQL error: {str(e)[:200]}")); continue
        s = norm_dates(spark_df[sorted(spark_df.columns)])
        d = norm_dates(duck_df[sorted(duck_df.columns)])
        if list(s.columns) != list(d.columns):
            fails.append((name, f"columns spark={list(s.columns)} duck={list(d.columns)}")); continue
        if len(s) != len(d):
            fails.append((name, f"rowcount spark={len(s)} duck={len(d)}")); continue
        bad = None
        for c in s.columns:
            sv, dv = s[c].to_numpy(), d[c].to_numpy()
            if sv.dtype.kind == 'f' or dv.dtype.kind == 'f':
                sv = sv.astype('float64'); dv = dv.astype('float64')
                eq = (sv == dv) | (np.isnan(sv) & np.isnan(dv))
            else:
                eq = pd.Series(sv, dtype=object).fillna('\0N').to_numpy() == \
                     pd.Series(dv, dtype=object).fillna('\0N').to_numpy()
            if not eq.all():
                i = int(np.argmin(eq))
                bad = (c, i, s[c].iloc[i], d[c].iloc[i],
                       str(s[c].dtype), str(d[c].dtype))
                break
        # dtype drift report (non-fatal but print — the driver may hash types)
        tdrift = [(c, str(s[c].dtype), str(d[c].dtype)) for c in s.columns
                  if str(s[c].dtype) != str(d[c].dtype)]
        if bad:
            fails.append((name, f"value col={bad[0]} row={bad[1]} spark={bad[2]!r}({bad[4]}) duck={bad[3]!r}({bad[5]})"))
        else:
            flag = f"  TYPES {tdrift}" if tdrift else ""
            print(f"OK   {name} rows={len(s)}{flag}")
    for name, n in nooracle:
        print(f"NOOR {name} rows={n} (rows-only check)")
    for name, msg in fails:
        print(f"FAIL {name}: {msg}")
    print(f"\n{len(fails)} failures")
    sys.exit(1 if fails else 0)

main()
