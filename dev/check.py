#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only —
the shipped library is pure Scala/Spark; this mirrors what the driver
does so oracle parity can be validated before a round ends).

Usage: python3 dev/check.py [verify_out_dir] [sf_dir]
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    out = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_out")
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    n_ok = n_bad = n_rows_only = 0
    for qdir in sorted(out.iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        spark_df = pd.read_parquet(qdir)
        if name not in oracle:
            # the driver sorts rows-only outputs too (r1: q_approx_quantiles
            # crashed its gate despite having no oracle) — replicate that
            try:
                spark_df.sort_values(list(spark_df.columns))
                status = "ROWS_ONLY" if len(spark_df) > 0 else "EMPTY!"
                n_rows_only += 1
            except Exception as e:
                status = "SORT_ERR!"
                n_bad += 1
                print(f"{status:10s} {name}: {type(e).__name__}: {e}")
                continue
            print(f"{status:10s} {name} rows={len(spark_df)}")
            continue
        try:
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE_ERR {name}: {e}")
            n_bad += 1
            continue
        a = spark_df.reindex(sorted(spark_df.columns), axis=1)
        b = duck_df.reindex(sorted(duck_df.columns), axis=1)
        if list(a.columns) != list(b.columns):
            print(f"COLS_DIFF  {name}: spark={list(a.columns)} duck={list(b.columns)}")
            n_bad += 1
            continue
        # The driver sorts result frames over all columns before hashing;
        # replicate it so unhashable cells (ndarray/dict) fail HERE, not
        # in the round gate (round-1 lesson: q_collect/q_approx_quantiles).
        try:
            a = a.sort_values(list(a.columns)).reset_index(drop=True)
            b = b.sort_values(list(b.columns)).reset_index(drop=True)
        except Exception as e:
            print(f"SORT_ERR   {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        # The driver's hash is dtype-sensitive at the KIND level (int64
        # 123 != float64 123.0) but not the width level — CORRECTNESS_r03
        # hash-passes spark int32 vs duck int64 and datetime64[ns] vs
        # [us] on 23 queries. Mirror that: normalize both frames to
        # canonical widths, then require exact dtype equality (round-1
        # lesson: DuckDB integer SUM -> HUGEINT -> float64 vs spark
        # int64; round-3 ADVICE: make the width policy explicit).
        def canon(df):
            out = df.copy()
            for c in out.columns:
                k = out[c].dtype.kind
                if k == "u":
                    # numpy astype('int64') silently WRAPS uint values
                    # >= 2^63, so two frames could hash-agree on wrapped
                    # garbage (round-4 ADVICE). Fail loudly instead.
                    if len(out[c]) and int(out[c].max()) > 2**63 - 1:
                        raise ValueError(
                            f"column {c}: uint64 value {out[c].max()} "
                            "exceeds int64 range — refusing to wrap")
                    out[c] = out[c].astype("int64")
                elif k == "i":
                    out[c] = out[c].astype("int64")
                elif k == "f":
                    out[c] = out[c].astype("float64")
                elif k == "M":
                    out[c] = out[c].astype("datetime64[ns]")
            return out
        try:
            a, b = canon(a), canon(b)
        except Exception as e:  # e.g. tz-aware datetime refusing [ns]
            print(f"DTYPE_DIFF {name}: canonicalization failed: {e}")
            n_bad += 1
            continue
        kind_diff = [
            f"{c}: spark={a[c].dtype} duck={b[c].dtype}"
            for c in a.columns
            if a[c].dtype != b[c].dtype
        ]
        if kind_diff:
            print(f"DTYPE_DIFF {name}: {kind_diff}")
            n_bad += 1
            continue
        if a.shape != b.shape:
            print(f"SHAPE_DIFF {name}: spark={a.shape} duck={b.shape}")
            n_bad += 1
            continue
        bad_cols = []
        for c in a.columns:
            av, bv = a[c], b[c]
            try:
                if av.dtype.kind == "f" or bv.dtype.kind == "f":
                    eq = ((av.astype(float) == bv.astype(float)) | (av.isna() & bv.isna())).all()
                elif "datetime" in str(av.dtype) or "datetime" in str(bv.dtype):
                    avd, bvd = pd.to_datetime(av), pd.to_datetime(bv)
                    eq = ((avd.values == bvd.values) | (avd.isna() & bvd.isna()).values).all()
                else:
                    eq = (av.astype(str).fillna("\0") == bv.astype(str).fillna("\0")).all()
            except Exception:
                eq = False
            if not eq:
                bad_cols.append(c)
        if bad_cols:
            print(f"VAL_DIFF   {name}: cols={bad_cols}")
            for c in bad_cols[:2]:
                m = (a[c].astype(str) != b[c].astype(str))
                idx = m[m].index[:3]
                for i in idx:
                    print(f"    row {i}: spark={a[c][i]!r} duck={b[c][i]!r}")
            n_bad += 1
        else:
            n_ok += 1
            print(f"OK         {name} rows={len(a)}")
    print(f"\n{n_ok} ok, {n_bad} bad, {n_rows_only} rows-only")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
