#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify's dump
against DuckDB executing oracle_sql.json over the same parquet tables, and
compare row-by-row after sorting columns by name and rows by value.

Usage: python3 tools/check_oracle.py <sfdir> <verify_out_dir>
"""
import sys, os, json, math
import duckdb
import pyarrow.parquet as pq
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # normalize dtypes for stable comparison
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def vals_equal(a, b):
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    except (TypeError, ValueError):
        return str(a) == str(b)

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        if not os.path.isdir(spark_dir):
            print(f"[MISS] {name}: no spark output"); failures += 1; continue
        try:
            got = pq.read_table(spark_dir).to_pandas()
        except Exception as e:
            print(f"[ERR ] {name}: read spark output: {e}"); failures += 1; continue
        try:
            exp = con.execute(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: duckdb: {str(e)[:200]}"); failures += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(e.columns)}")
            failures += 1; continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(e)}"); failures += 1; continue
        bad = None
        for i in range(len(g)):
            for c in g.columns:
                if not vals_equal(g[c].iloc[i], e[c].iloc[i]):
                    bad = (i, c, g[c].iloc[i], e[c].iloc[i]); break
            if bad: break
        if bad:
            print(f"[FAIL] {name}: row {bad[0]} col {bad[1]}: spark={bad[2]!r} duckdb={bad[3]!r}")
            failures += 1
        else:
            print(f"[ OK ] {name}: {len(g)} rows")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
