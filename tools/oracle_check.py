#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev tool only —
not part of the library). Usage:
    python3 tools/oracle_check.py <sfDir> <verifyOutDir>
Reads each <name>/ parquet dump written by graft.Verify, runs the matching
oracle_sql.json query in DuckDB over the same sf tables, and compares
sorted rows/columns exactly.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in files]) if files \
            else pd.DataFrame()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"  [FAIL-sql ] {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"  [FAIL-cols] {name}: spark={list(g.columns)} "
                  f"duckdb={list(e.columns)}")
            n_bad += 1
            continue
        if len(g) != len(e):
            print(f"  [FAIL-rows] {name}: spark={len(g)} duckdb={len(e)}")
            n_bad += 1
            continue
        # value compare: exact string repr per cell
        mism = None
        for c in g.columns:
            a = g[c].astype(str).values
            b = e[c].astype(str).values
            bad = (a != b)
            if bad.any():
                i = bad.argmax()
                mism = (c, i, a[i], b[i])
                break
        if mism:
            c, i, av, bv = mism
            print(f"  [FAIL-val ] {name}: col={c} row={i} "
                  f"spark={av!r} duckdb={bv!r}")
            n_bad += 1
        else:
            print(f"  [OK       ] {name}: {len(g)} rows")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
