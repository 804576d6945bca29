#!/usr/bin/env python3
"""Local dev emulation of the driver's t2 correctness gate.

Usage: python3 scripts/check.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet (Spark result) and runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the same tables,
then compares: column names (sorted), dtypes (loose), row counts, and
values (rows sorted by all columns). Exact equality required — floats
too, since queries are expected to round for determinism.
"""
import glob
import json
import math
import sys
import time

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(outdir, sfdir, only=None):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    results = {}
    times = {}
    for name in sorted(oracle):
        t0 = time.time()
        sql = oracle[name]
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            results[name] = "MISSING_SPARK_OUTPUT"
            continue
        try:
            sdf = con.sql(
                f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')"
            ).df()
            odf = con.sql(sql).df()
        except Exception as e:
            results[name] = f"ERROR: {e}"
            continue
        s, o = canon(sdf), canon(odf)
        if list(s.columns) != list(o.columns):
            results[name] = f"COLS: spark={list(s.columns)} oracle={list(o.columns)}"
            continue
        # STRICT dtype equality — the driver's hash is type-representation
        # sensitive, so an oracle that lets DuckDB widen (sum(BIGINT) ->
        # HUGEINT -> pandas object; datediff -> BIGINT vs Spark INT)
        # hash-mismatches even when every value is equal (the r4
        # window_range_frame failure class). Catch it here, loudly,
        # instead of in the driver's ledger.
        dt_bad = [f"{c}: spark={s[c].dtype} oracle={o[c].dtype}"
                  for c in s.columns if str(s[c].dtype) != str(o[c].dtype)]
        if dt_bad:
            results[name] = "DTYPES: " + "; ".join(dt_bad)
            print(f"[FAIL] {name}  {results[name]}", flush=True)
            continue
        if len(s) != len(o):
            results[name] = f"ROWS: spark={len(s)} oracle={len(o)}"
            continue
        mism = []
        for c in s.columns:
            a, b = s[c], o[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    af = a.astype(float)
                    bf = b.astype(float)
                    bad = ~((af == bf) | (af.isna() & bf.isna()))
                    if bad.any():
                        d = (af - bf).abs().max()
                        mism.append(f"{c}: {int(bad.sum())} diffs maxabs={d}")
                else:
                    aa = a.astype(str)
                    bb = b.astype(str)
                    bad = aa != bb
                    if bad.any():
                        i = bad.idxmax()
                        mism.append(
                            f"{c}: {int(bad.sum())} diffs e.g. row {i}: "
                            f"{aa[i]!r} vs {bb[i]!r}")
            except Exception as e:
                mism.append(f"{c}: compare error {e}")
        results[name] = "OK" if not mism else "VALS: " + "; ".join(mism)
        times[name] = time.time() - t0
        print(f"[{'PASS' if results[name] == 'OK' else 'FAIL'}] {name}"
              f"  ({times[name]:.1f}s)", flush=True)
    npass = sum(1 for v in results.values() if v == "OK")
    for name, v in results.items():
        mark = "PASS" if v == "OK" else "FAIL"
        print(f"[{mark}] {name}" + ("" if v == "OK" else f"  {v}"))
    print(f"\n{npass}/{len(results)} oracle-checked queries pass")
    # rows-only queries (no oracle): report presence
    all_out = {p.rstrip('/').split('/')[-1]
               for p in glob.glob(f"{outdir}/*/")}
    for name in sorted(all_out - set(oracle)):
        n = con.sql(
            f"SELECT count(*) FROM read_parquet('{outdir}/{name}/*.parquet')"
        ).fetchone()[0]
        print(f"[ROWS] {name}: {n} rows (no oracle)")
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
