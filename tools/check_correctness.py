#!/usr/bin/env python
"""Local emulation of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its
``oracle_sql()`` on DuckDB, then compares row count, schema (sorted
column names) and values (columns sorted by name, rows sorted by all
columns; exact match for non-floats, exact AND 1e-9-relative match
reported for floats). Exit code 1 if anything mismatches.

Usage: python tools/check_correctness.py [--sf-dir /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __spark_entry__ as entrymod  # noqa: E402
from oakstore_spark.session import get_spark  # noqa: E402
from oakstore_spark.sources import TABLES  # noqa: E402


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def compare(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    s_cols, o_cols = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if s_cols != o_cols:
        problems.append(f"columns spark={s_cols} oracle={o_cols}")
        return problems
    if problems:
        return problems
    s, o = canon(spark_pdf), canon(oracle_pdf)
    for c in s.columns:
        sv, ov = s[c], o[c]
        if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(ov):
            a = sv.astype(float).to_numpy()
            b = ov.astype(float).to_numpy()
            both_nan = np.isnan(a) & np.isnan(b)
            exact = np.array_equal(a, b, equal_nan=True)
            close = np.all(both_nan | np.isclose(a, b, rtol=1e-9, atol=1e-12))
            if not exact:
                tag = "float-inexact" if close else "float-MISMATCH"
                idx = np.where(~(both_nan | (a == b)))[0][:3]
                problems.append(f"{tag} col={c} examples={[ (a[i], b[i]) for i in idx ]}")
            elif len(a) and np.any(
                (np.signbit(a) != np.signbit(b)) & ~both_nan
            ):
                # The driver hashes bytes/strings where -0.0 != 0.0 even
                # though numpy == says equal. Surface it as a hard fail.
                idx = np.where((np.signbit(a) != np.signbit(b)) & ~both_nan)[0][:3]
                problems.append(
                    f"signed-zero col={c} examples={[ (a[i], b[i]) for i in idx ]}"
                    " (driver byte-hash would mismatch)"
                )
        else:
            if not sv.astype(str).equals(ov.astype(str)):
                bad = (sv.astype(str) != ov.astype(str))
                i = bad[bad].index[:3].tolist()
                problems.append(f"value col={c} rows={i} spark={sv.loc[i].tolist()} oracle={ov.loc[i].tolist()}")
    # dtype parity report (schema check)
    for c in s.columns:
        sk, ok_ = str(s[c].dtype), str(o[c].dtype)
        if sk != ok_:
            problems.append(f"dtype col={c} spark={sk} oracle={ok_}")
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("check_correctness")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.names or sorted(qs)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            spark_pdf = qs[name](spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            oracle_pdf = con.sql(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        problems = compare(name, spark_pdf, oracle_pdf)
        hard = [p for p in problems if not p.startswith("float-inexact") and not p.startswith("dtype")]
        soft = [p for p in problems if p.startswith("float-inexact") or p.startswith("dtype")]
        status = "FAIL" if hard else ("WARN" if soft else "PASS")
        if hard:
            n_fail += 1
        print(f"{status} {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
        for p in problems:
            print(f"    {p}")
    print(f"\n{len(names)} queries, {n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
