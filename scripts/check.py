#!/usr/bin/env python3
"""Local dev harness replicating the driver's correctness gate:
run graft.Verify output (parquet per query + oracle_sql.json) against
DuckDB on the same testdata tables, compare row counts, schemas, and
value hashes (columns sorted by name, rows sorted by all columns).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import sys, json, glob, os
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    # bound the oracle's parallelism AND memory: the heavy IVF-build CTEs
    # transiently OOM when 178 queries share one connection on a loaded
    # host; fewer threads -> smaller intermediates, an explicit
    # memory_limit makes DuckDB spill instead of aborting, and a failed
    # query gets one quiet retry on a FRESH connection before it counts
    con.execute("SET threads=4")
    con.execute("SET memory_limit='8GB'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        res_glob = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not res_glob:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            got = canon(con.sql(f"SELECT * FROM '{res_glob[0]}'").df())
            want = canon(con.sql(sql).df())
        except Exception:
            try:  # one retry on a fresh, quieter connection
                c2 = duckdb.connect()
                c2.execute("SET threads=2")
                c2.execute("SET memory_limit='8GB'")
                for t_ in ["region","nation","customer","supplier","part","orders",
                           "lineitem","events","documents","embeddings"]:
                    p_ = f"{sf_dir}/{t_}.parquet"
                    if os.path.exists(p_):
                        c2.execute(f"CREATE VIEW {t_} AS SELECT * FROM '{p_}'")
                got = canon(c2.sql(f"SELECT * FROM '{res_glob[0]}'").df())
                want = canon(c2.sql(sql).df())
                c2.close()
            except Exception as e:
                print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(want.columns)}"); n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs {len(want)}"); n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True)
            print(f"OK   {name} ({len(got)} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch\n{str(e)[:2000]}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
