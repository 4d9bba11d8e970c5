"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry at a given SF dir and compares it against
its ``oracle_sql()`` SQL in DuckDB: row count, column names/types, and
exact values after sorting columns by name and rows by all columns.
Queries without an oracle get the rows-only check.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Deliberately NO list-to-tuple rescue: the driver's canonicalizer
    # crashes on list-valued cells (TypeError: unhashable type 'list'),
    # so an array-typed output column must be a FAIL here too.
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def _kind(dt) -> str:
    """Coarse dtype class for hash-compat purposes."""
    if np.issubdtype(dt, np.bool_):
        return "bool"
    if np.issubdtype(dt, np.integer):
        return "int"
    if np.issubdtype(dt, np.floating):
        return "float"
    if np.issubdtype(dt, np.datetime64):
        return "datetime"
    return "object"


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> str:
    if len(spark_pdf) != len(duck_pdf):
        return f"ROWCOUNT spark={len(spark_pdf)} duck={len(duck_pdf)}"
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        return f"COLUMNS spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
    # Driver strictness (verified by the round-2 gate): the driver's
    # value hash does NOT coerce across numeric classes — int64 1234 vs
    # float64 1234.0 is a hash MISMATCH — and list-valued cells crash
    # its canonicalizer.  Only int width (int32/64) and datetime unit
    # (ns/us) are tolerated.  We therefore fail on any cross-class
    # dtype drift and on any list/ndarray cell, before value compare.
    for c in sorted(spark_pdf.columns):
        sk, dk = _kind(spark_pdf[c].dtype), _kind(duck_pdf[c].dtype)
        if sk != dk:
            return (
                f"DTYPE col={c} spark={spark_pdf[c].dtype}({sk}) "
                f"duck={duck_pdf[c].dtype}({dk}) — driver hash mismatch"
            )
        for side, pdf in (("spark", spark_pdf), ("duck", duck_pdf)):
            if pdf[c].dtype == object and any(
                isinstance(v, (list, np.ndarray)) for v in pdf[c].head(100)
            ):
                return f"LISTVALS col={c} side={side} — driver canonicalizer crashes on lists"
    try:
        a, b = canon(spark_pdf), canon(duck_pdf)
    except TypeError as ex:
        return f"CANON-CRASH {ex} (driver would error identically)"
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) and np.issubdtype(bv.dtype, np.floating):
            both_nan = np.isnan(av) & np.isnan(bv)
            if not bool(np.all(both_nan | (av == bv))):
                i = int(np.argmax(~(both_nan | (av == bv))))
                return f"VALUES col={c} row{i}: spark={av[i]!r} duck={bv[i]!r}"
        elif np.issubdtype(av.dtype, np.datetime64) and np.issubdtype(bv.dtype, np.datetime64):
            av = av.astype("datetime64[ns]")
            bv = bv.astype("datetime64[ns]")
            if not bool(np.all((pd.isna(av) & pd.isna(bv)) | (av == bv))):
                i = int(np.argmax(~((pd.isna(av) & pd.isna(bv)) | (av == bv))))
                return f"VALUES col={c} row{i}: spark={av[i]!r} duck={bv[i]!r}"
        else:
            av = pd.Series(av).astype(str).to_numpy()
            bv = pd.Series(bv).astype(str).to_numpy()
            if not bool(np.all(av == bv)):
                i = int(np.argmax(av != bv))
                return f"VALUES col={c} row{i}: spark={av[i]!r} duck={bv[i]!r}"
    return "OK"


def main() -> None:
    from pipeline_query_engine_demo_spark.session import get_spark

    import __spark_entry__ as e

    spark = get_spark("correctness-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_ok = n_fail = 0
    failures = []
    for name, build in qs.items():
        if ONLY and name not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = build(spark, SF_DIR)
            spark_pdf = sdf.toPandas()
            if name in oracles:
                duck_pdf = con.sql(oracles[name]).df()
                verdict = compare(name, spark_pdf, duck_pdf)
            else:
                # The driver records oracle-less queries as err:no_oracle
                # (no rows-only fallback exists in practice) — so a
                # registered query without an oracle is a FAIL here.
                verdict = f"NO-ORACLE n={len(spark_pdf)} (driver records err:no_oracle)"
        except Exception as ex:
            verdict = f"ERROR {type(ex).__name__}: {str(ex).splitlines()[0][:200]}"
            traceback.print_exc(limit=3)
        dt = time.time() - t0
        ok = verdict == "OK"
        n_ok += ok
        n_fail += not ok
        if not ok:
            failures.append(name)
        print(f"{'PASS' if ok else 'FAIL':4} {name:40} {dt:6.2f}s  {verdict}")
    print(f"\n{n_ok} ok, {n_fail} fail" + (f": {failures}" if failures else ""))
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
