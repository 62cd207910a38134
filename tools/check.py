#!/usr/bin/env python3
"""Local mimic of the driver's t2 correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [nameSubstr,...]

The optional third arg restricts the compare to queries whose name
contains any of the comma-separated substrings (pairs with Verify's
SPARK_GRAFT_ONLY for fast single-query iteration).

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from <verifyOutDir>/oracle_sql.json in DuckDB over the
same sfDir parquet tables, sorts columns by name and rows by all columns,
and compares cell-by-cell (exact; floats compared bitwise via repr).
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    # Verify records thrown queries here (and exits non-zero) — surface
    # them as failures up front so a broken query can never read as a
    # green run by omission (ADVICE r7)
    import os
    failed_path = f"{out_dir}/failed.json"
    pre_failed = 0
    threw = set()
    if os.path.exists(failed_path):
        for name, err in sorted(json.load(open(failed_path)).items()):
            print(f"FAIL {name}: threw in Verify: {err}")
            threw.add(name)
            pre_failed += 1
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) > 3:
        subs = [s for s in sys.argv[3].split(",") if s]
        oracle = {k: v for k, v in oracle.items()
                  if any(s in k for s in subs)}
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if name in threw:
            continue  # already FAILed above; stale parquet must not read OK
        try:
            got = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            n_bad += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            n_bad += 1
            continue
        bad = None
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            for i, (a, b) in enumerate(zip(gv, wv)):
                ra, rb = repr(a), repr(b)
                if ra != rb and not (a != a and b != b):  # NaN==NaN ok
                    bad = (c, i, ra, rb)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i}: spark={a} oracle={b}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(g)} rows)")
            n_ok += 1
    n_bad += pre_failed
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
