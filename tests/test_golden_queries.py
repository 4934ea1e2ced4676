"""North-rule gate: the frozen 25-query reference set, rank-identical
docIDs + scores (tol 1e-6) vs the committed golden top-k."""

from __future__ import annotations

import json
import os

import pytest

from solr_indexing_spark.query.bmw import topk
from solr_indexing_spark.query.brute import bm25_topk

from tests.test_index_build import index_dir  # noqa: F401

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load():
    with open(f"{HERE}/fixtures/golden_topk.jsonl") as fh:
        return [json.loads(line) for line in fh]


GOLDEN = _load()


@pytest.mark.parametrize("case", GOLDEN, ids=[g["query"][:30] for g in GOLDEN])
def test_golden_bmw(spark, index_dir, case):  # noqa: F811
    got = [
        (r["doc_id"], r["score"])
        for r in topk(spark, index_dir, case["query"], k=10).collect()
    ]
    want = [(g["doc_id"], g["score"]) for g in case["topk"]]
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6


def test_golden_brute_sample(spark, index_dir):  # noqa: F811
    docs = spark.read.parquet(f"{index_dir}/docs")
    for case in GOLDEN[::5]:
        got = [
            (r["doc_id"], r["score"])
            for r in bm25_topk(docs, case["query"], k=10).collect()
        ]
        want = [(g["doc_id"], g["score"]) for g in case["topk"]]
        assert [d for d, _ in got] == [d for d, _ in want], case["query"]
