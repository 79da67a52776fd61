#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables, load the Spark result parquet,
sort columns by name + rows by all columns, and compare values.

Usage: compare_oracle.py <sfDir> <verifyOutDir>
"""
import json, math, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(f"{out_dir}/{name}")
            duck_df = con.execute(sql).fetchdf()
            s, d = norm(spark_df), norm(duck_df)
            if list(s.columns) != list(d.columns):
                results[name] = f"SCHEMA spark={list(s.columns)} duck={list(d.columns)}"
                continue
            if len(s) != len(d):
                results[name] = f"ROWS spark={len(s)} duck={len(d)}"
                continue
            bad = None
            for c in s.columns:
                sv, dv = s[c], d[c]
                if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                    eq = (sv.astype("float64").fillna(-1e308) ==
                          dv.astype("float64").fillna(-1e308))
                else:
                    eq = sv.fillna("__null__").astype(str) == dv.fillna("__null__").astype(str)
                if not eq.all():
                    i = int(eq.idxmin())
                    bad = f"VALUES col={c} row={i} spark={sv[i]!r} duck={dv[i]!r}"
                    break
            results[name] = bad or "OK"
        except Exception as e:
            results[name] = f"ERROR {type(e).__name__}: {e}"
    n_ok = sum(1 for v in results.values() if v == "OK")
    for name, v in sorted(results.items()):
        print(("PASS " if v == "OK" else "FAIL ") + name + ("" if v == "OK" else "  " + v))
    print(f"\n{n_ok}/{len(results)} oracle-matched")
    import os
    rows_only = [p for p in sorted(os.listdir(out_dir))
                 if p != "oracle_sql.json" and p not in oracle]
    for name in rows_only:
        try:
            n = len(pd.read_parquet(f"{out_dir}/{name}"))
            print(f"ROWS-ONLY {name}: {n} rows" + ("  *** EMPTY ***" if n == 0 else ""))
        except Exception as e:
            print(f"ROWS-ONLY {name}: ERROR {e}")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
