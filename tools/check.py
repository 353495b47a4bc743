#!/usr/bin/env python3
"""Dev-only local mirror of the driver's DuckDB-oracle correctness gate.

NOT part of the shipped library (the Scala engine has no Python deps) --
this exists so we can validate `SparkEntry.queries` vs `SparkEntry.oracleSql`
locally before the driver runs the real gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]
after: sbt "runMain graft.Verify <sfDir> <verifyOutDir>"
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64") and "," in dt:  # tz-aware -> naive UTC
            df[c] = df[c].dt.tz_convert("UTC").dt.tz_localize(None)
        if dt.startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df


def cmp_col(a: pd.Series, b: pd.Series):
    """Return (status, detail). status in OK|NEAR|FAIL.

    The driver's gate hashes raw value encodings after sorting columns, so
    an int64 Spark column vs a HUGEINT/float DuckDB column hash-mismatches
    even when numerically equal (this bit us in round 1: un-cast DuckDB
    sum(BIGINT) returns HUGEINT). Mirror that strictness: differing numeric
    kinds (int vs float) are a FAIL here, never silently compared as float.
    """
    ka, kb = a.dtype.kind, b.dtype.kind
    numeric = {"i", "u", "f"}
    if ka != kb and ((ka in numeric and kb in numeric and "f" in {ka, kb})
                     or (ka in numeric) != (kb in numeric)):
        return "FAIL", f"dtype kind mismatch: spark={a.dtype} oracle={b.dtype} (driver hash would differ)"
    # same-kind WIDTH differences (int32 vs int64) are deliberately NOT
    # failed: the driver gate hash-matches them (empirical — split_points/
    # text_stats/win_ntile_cume et al. ship Spark INT vs DuckDB BIGINT and
    # have passed every round), i.e. it normalizes numeric VALUES, and only
    # kind mismatches (int vs float/decimal, the round-1 HUGEINT incident)
    # change the hashed representation.
    if str(a.dtype).startswith("float") or str(b.dtype).startswith("float"):
        av, bv = a.astype(float).values, b.astype(float).values
        both_nan = np.isnan(av) & np.isnan(bv)
        eq = (av == bv) | both_nan
        if eq.all():
            return "OK", ""
        close = np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True)
        if close.all():
            # report the row with the LARGEST diff (argmin(eq) is merely
            # the first non-equal row — useless for judging atol headroom)
            diffs = np.where(both_nan, 0.0, np.abs(av - bv))
            i = int(np.nanargmax(diffs))
            return "NEAR", f"max float diff at row {i}: {av[i]!r} vs {bv[i]!r}"
        i = int(np.argmin(close))
        return "FAIL", f"float mismatch row {i}: {av[i]!r} vs {bv[i]!r}"
    eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
    if eq.all():
        return "OK", ""
    i = int(np.argmin(eq))
    return "FAIL", f"mismatch row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_ok = n_fail = 0
    for name in sorted(oracle):
        try:
            exp = norm(con.execute(oracle[name]).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        try:
            got = norm(pq.read_table(f"{out}/{name}").to_pandas())
        except Exception as e:
            print(f"FAIL {name}: spark output unreadable: {e}")
            n_fail += 1
            continue
        if sorted(exp.columns) != sorted(got.columns):
            print(f"FAIL {name}: cols spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
            continue
        bad = []
        for c in exp.columns:
            st, detail = cmp_col(got[c], exp[c])
            if st != "OK":
                bad.append((c, st, detail))
        if not bad:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
        else:
            for c, st, detail in bad:
                print(f"{st} {name}.{c}: {detail}")
            n_fail += 1
    # per-query run status (Verify writes it since round 7): a query that
    # THREW during the dump has no output dir, so the oracle loop above
    # never sees it — without this check a thrown query silently shrinks
    # the denominator (round 6 lost all five window queries that way)
    n_run_err = 0
    try:
        status = json.load(open(f"{out}/_run_status.json"))
        for name, st in sorted(status.items()):
            if "err" in st:
                print(f"FAIL {name}: query threw during dump: {st['err']}")
                n_run_err += 1
    except FileNotFoundError:
        print("WARN: no _run_status.json (old Verify build?) — thrown queries invisible")
    print(f"\n{n_ok} ok / {n_fail} fail / {len(oracle)} total; {n_run_err} dump errors")
    sys.exit(1 if (n_fail or n_run_err) else 0)


if __name__ == "__main__":
    main()
