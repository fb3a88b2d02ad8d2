#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: load each Verify output
parquet, run the corresponding oracle SQL in DuckDB over the raw testdata
tables, and compare (sorted columns, sorted rows, exact values).

Usage: check_oracle.py <sfDir> <verifyOutDir>
(Run `sbt "runMain graft.Verify <sfDir> <verifyOutDir>"` first.)
"""
import sys, os, json, glob
import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # Verify writes an _ERROR.txt marker instead of parquet when the
        # query threw — surface it as a FAIL, never silently skip (r12 lost
        # 5 broken queries to exactly that silence).
        errf = os.path.join(d, "_ERROR.txt")
        if os.path.exists(errf):
            print(f"[FAIL] {name}: query error: {open(errf).read().strip()[:300]}")
            n_fail += 1
            continue
        got = pd.read_parquet(d)
        if name not in oracle:
            print(f"[rows-only] {name}: {len(got)} rows")
            continue
        try:
            exp = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(e.columns)}")
            n_fail += 1
            continue
        if len(g) != len(e):
            print(f"[FAIL] {name}: rows {len(g)} != {len(e)}")
            n_fail += 1
            continue
        try:
            # check_dtype=True: the driver's hash is type-sensitive (a DuckDB
            # HUGEINT vs Spark BIGINT diverges even with equal values), so the
            # local gate must be too.
            pd.testing.assert_frame_equal(g, e, check_dtype=True, check_exact=True)
            print(f"[ok] {name}: {len(g)} rows")
            n_pass += 1
        except AssertionError as ex:
            print(f"[FAIL] {name}: value mismatch\n{str(ex)[:800]}")
            # show first differing row for debugging
            neq = (g != e) & ~(g.isna() & e.isna())
            rows = neq.any(axis=1)
            if rows.any():
                i = rows.idxmax()
                print("  got:", g.loc[i].to_dict())
                print("  exp:", e.loc[i].to_dict())
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
