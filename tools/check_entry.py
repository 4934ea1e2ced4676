"""Local mirror of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and, where an
``oracle_sql()`` entry exists, the same query on DuckDB over the same
parquet tables; compares row count, column names, and an order-insensitive
value comparison (columns sorted by name, rows sorted by all columns).

Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"create view {t} as select * from '{sf_dir}/{t}.parquet'"
        )
    return con


def canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return pdf.sort_values(list(pdf.columns), ignore_index=True)


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    errs = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        errs.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} "
            f"duck={sorted(duck_pdf.columns)}"
        )
        return errs
    if len(spark_pdf) != len(duck_pdf):
        errs.append(f"row count: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    a, b = canon(spark_pdf), canon(duck_pdf)
    if len(a) == len(b):
        for c in a.columns:
            av, bv = a[c].to_numpy(), b[c].to_numpy()
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = np.allclose(
                    av.astype(float), bv.astype(float), rtol=0, atol=1e-9,
                    equal_nan=True,
                )
            else:
                ok = (pd.Series(av) == pd.Series(bv)).all()
            if not ok:
                mism = [
                    (i, av[i], bv[i])
                    for i in range(len(av))
                    if not _eq(av[i], bv[i])
                ][:5]
                errs.append(f"values differ in col {c}: {mism}")
    return errs


def _eq(x, y):
    try:
        if isinstance(x, float) or isinstance(y, float):
            return abs(float(x) - float(y)) <= 1e-9 or (
                np.isnan(float(x)) and np.isnan(float(y))
            )
        return x == y
    except (TypeError, ValueError):
        return x == y


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from solr_indexing_spark.session import get_spark

    spark = get_spark("check_entry", cores=8, shuffle_partitions=16)
    con = duck_con(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        dt = time.monotonic() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_pdf)} rows, {dt:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(oracles[name]).df()
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {str(ex)[:300]}")
            n_fail += 1
            continue
        errs = compare(name, spark_pdf, duck_pdf)
        if errs:
            n_fail += 1
            print(f"FAIL {name} ({len(spark_pdf)} vs {len(duck_pdf)} rows):")
            for err in errs:
                print(f"     {err}")
        else:
            print(f"OK   {name} ({len(spark_pdf)} rows, {dt:.1f}s)")
    print(f"\n{n_fail} failures")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
