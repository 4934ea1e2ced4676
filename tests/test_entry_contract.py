"""The driver contract: every queries() entry runs and matches its DuckDB
oracle at sf0.001 (the driver itself runs sf0.01 — same shapes, more rows).

This is the local mirror of CORRECTNESS_r{N}.json: row count + column names
+ order-insensitive value comparison, via tools/check_entry.py.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from tools.check_entry import compare, duck_con  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

_QUERIES = entry_mod.queries()
_ORACLES = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


def test_oracle_keys_subset_of_queries():
    assert set(_ORACLES) <= set(_QUERIES)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert {f.name for f in df.schema.fields} == {"doc_id", "url", "score"}


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(spark, con, name):
    pdf = _QUERIES[name](spark, SF_DIR).toPandas()
    if name not in _ORACLES:
        assert len(pdf) > 0, f"rows-only entry {name} returned 0 rows"
        return
    duck_pdf = con.execute(_ORACLES[name]).df()
    errs = compare(name, pdf, duck_pdf)
    assert not errs, f"{name}: {errs}"
