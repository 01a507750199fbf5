#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and its oracle on DuckDB over
the same parquet tables, then compares row count, column names/types,
and order-insensitive values (exact for non-floats, tiny tolerance
for floats). Use while iterating:

    python tools/check_parity.py [--sf /root/testdata/sf0.001] [name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aws_lakehouse_spark.catalog import TABLES  # noqa: E402
from aws_lakehouse_spark.registry import load_all  # noqa: E402
from aws_lakehouse_spark.session import get_spark  # noqa: E402


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            first = df[c].dropna()
            if len(first) and isinstance(first.iloc[0], (pd.Timestamp,)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
    sort_cols = [c for c in df.columns if df[c].dtype != object or True]
    try:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    except Exception:
        df = df.sort_values(by=sort_cols[:1], kind="mergesort")
    return df.reset_index(drop=True)


def _is_decimal_col(sv: pd.Series) -> bool:
    """True when an object-dtype column holds decimal.Decimal values.

    Spark DecimalType output arrives in pandas as exactly this shape;
    the driver's exact value hash sees Decimal('1.740000') and the
    double 1.74 as different even when numerically identical.
    """
    import decimal

    if sv.dtype != object:
        return False
    nn = sv.dropna()
    return len(nn) > 0 and isinstance(nn.iloc[0], decimal.Decimal)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        problems.append(f"columns spark={s_cols} duck={d_cols}")
        return problems
    s = normalize(spark_pdf)
    d = normalize(duck_pdf)
    if problems:
        return problems
    for c in s.columns:
        sv, dv = s[c], d[c]
        # Decimal-vs-float is a hard failure BEFORE the float branch can
        # astype(float) it away: Spark DecimalType (object dtype of
        # decimal.Decimal) paired with a duck float column is exactly
        # how sql_pipe_syntax read "verified fixed" for two rounds
        # while the driver's exact hash kept failing on the padded
        # Decimal('…740000') representation. Same class as the
        # int-vs-float guard below.
        if _is_decimal_col(sv) != _is_decimal_col(dv):
            dec_side = "spark" if _is_decimal_col(sv) else "duck"
            problems.append(
                f"col {c}: decimal-vs-nondecimal divergence "
                f"({dec_side} side is Decimal; spark={sv.dtype} "
                f"duck={dv.dtype}) — driver hash would fail; CAST the "
                "decimal side to DOUBLE"
            )
            continue
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
            # int-on-one-side / float-on-the-other is a hard failure:
            # the driver's strict value hash sees 1 vs 1.0 as a
            # mismatch (this is exactly how agg_pivot's HUGEINT
            # oracle slipped past this replica in round 1)
            if pd.api.types.is_integer_dtype(sv) or pd.api.types.is_integer_dtype(dv):
                problems.append(
                    f"col {c}: int-vs-float dtype divergence "
                    f"spark={sv.dtype} duck={dv.dtype} — driver hash "
                    "would fail; align casts on both sides"
                )
                continue
            sa = sv.astype(float).to_numpy()
            da = dv.astype(float).to_numpy()
            both_nan = np.isnan(sa) & np.isnan(da)
            close = np.isclose(sa, da, rtol=1e-9, atol=1e-9) | both_nan
            if not close.all():
                i = int(np.argmin(close))
                problems.append(
                    f"float col {c}: {int((~close).sum())} diffs, "
                    f"e.g. row {i}: {sa[i]!r} vs {da[i]!r}"
                )
            elif not (sa[~np.isnan(sa)] == da[~np.isnan(da)]).all():
                problems.append(f"float col {c}: equal within tol but NOT bitwise")
        else:
            if sv.dtype != dv.dtype:
                try:
                    eq = (sv.isna() == dv.isna()).all() and (
                        sv.dropna().astype(str).to_numpy()
                        == dv.dropna().astype(str).to_numpy()
                    ).all()
                except Exception:
                    eq = False
                tag = "dtype-mismatch" if not eq else "dtype-differs-values-match"
                problems.append(f"col {c}: {tag} spark={sv.dtype} duck={dv.dtype}")
                continue
            neq = ~((sv == dv) | (sv.isna() & dv.isna()))
            if neq.any():
                i = int(np.argmax(neq.to_numpy()))
                problems.append(
                    f"col {c}: {int(neq.sum())} diffs, e.g. row {i}: "
                    f"{sv.iloc[i]!r} vs {dv.iloc[i]!r}"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    registry = load_all()
    names = args.names or list(registry)
    spark = get_spark("parity-check", master="local[8]", shuffle_partitions=8)
    con = duck_connect(args.sf)

    n_pass = n_fail = n_rows_only = 0
    failures: list[str] = []
    for name in names:
        spec = registry[name]
        # engine and oracle walls are recorded SEPARATELY: a conflated
        # per-query time hides which side is slow, which is exactly
        # where the next one-split-serialization class of bug would
        # hide in an sf1 sweep (r8 verdict item 4)
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf)
            spark_pdf = sdf.toPandas()
        except Exception:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: SPARK ERROR\n{traceback.format_exc()}", flush=True)
            continue
        engine_s = time.time() - t0
        if spec.oracle is None:
            n_rows_only += 1
            print(
                f"rows-only {name}: {len(spark_pdf)} rows "
                f"(engine {engine_s:.1f}s)",
                flush=True,
            )
            continue
        t1 = time.time()
        try:
            duck_pdf = con.sql(spec.oracle).df()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name}: DUCKDB ERROR {e}", flush=True)
            continue
        oracle_s = time.time() - t1
        problems = compare(name, spark_pdf, duck_pdf)
        hard = [p for p in problems if "values-match" not in p and "NOT bitwise" not in p]
        timing = f"engine {engine_s:.1f}s, oracle {oracle_s:.1f}s"
        if hard:
            n_fail += 1
            failures.append(name)
            print(f"FAIL {name} ({len(spark_pdf)} rows, {timing}):", flush=True)
            for p in problems:
                print(f"    {p}", flush=True)
        else:
            n_pass += 1
            soft = "; ".join(problems)
            extra = f" [warn: {soft}]" if soft else ""
            print(
                f"pass {name}: {len(spark_pdf)} rows "
                f"({timing}){extra}",
                flush=True,
            )
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only "
        f"of {len(names)}",
        flush=True,
    )
    if failures:
        print("failures:", " ".join(failures), flush=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
