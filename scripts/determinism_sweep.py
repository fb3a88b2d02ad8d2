#!/usr/bin/env python3
"""Canonical-compare two Verify output dirs: for every query dir present
in either, load the parquet with duckdb, sort columns by name, stringify
and sort rows (dtype-strict: the dtype string rides in the canonical
form), and require bit-identical results. Usage:

    python3 scripts/determinism_sweep.py /tmp/verify-d1 /tmp/verify-d2
"""
import sys
import os

import duckdb


def canon(dirpath: str, q: str):
    con = duckdb.connect()
    df = con.execute(
        f"SELECT * FROM read_parquet('{dirpath}/{q}/*.parquet')").fetchdf()
    cols = sorted(df.columns)
    df = df[cols]
    dtypes = [str(df[c].dtype) for c in cols]
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    con.close()
    return cols, dtypes, rows


def main():
    a, b = sys.argv[1], sys.argv[2]
    qs_a = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
    qs_b = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
    if qs_a != qs_b:
        print(f"FAIL: query sets differ: only-a={qs_a - qs_b} only-b={qs_b - qs_a}")
        sys.exit(1)
    bad = 0
    for q in sorted(qs_a):
        ca, cb = canon(a, q), canon(b, q)
        if ca != cb:
            bad += 1
            print(f"[DIFF] {q}")
            if ca[0] != cb[0]:
                print(f"  columns: {ca[0]} vs {cb[0]}")
            elif ca[1] != cb[1]:
                print(f"  dtypes: {ca[1]} vs {cb[1]}")
            else:
                for ra, rb in zip(ca[2], cb[2]):
                    if ra != rb:
                        print(f"  first differing row: {ra} vs {rb}")
                        break
                else:
                    # one sorted row list is a strict prefix of the other:
                    # no zipped pair differs, so say the counts
                    print(f"  row counts: {len(ca[2])} vs {len(cb[2])}")
        else:
            print(f"[ok] {q}: {len(ca[2])} rows")
    print(f"\n{len(qs_a) - bad}/{len(qs_a)} query dirs bit-identical")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
