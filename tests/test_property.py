"""Property-based tests (hypothesis) — SURVEY.md §5.2-3.

Pure-python properties run at full example counts; Spark-backed properties
run few examples (each costs Spark actions) with deadline disabled.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from solr_indexing_spark.codec import (
    delta_decode,
    delta_encode,
    vbyte_decode,
    vbyte_encode,
    vbyte_encode_chunked,
)
from solr_indexing_spark.query.oracle import OracleIndex
from solr_indexing_spark.textprep import extract_text_str, tokenize_str

uint64s = st.lists(
    st.integers(min_value=0, max_value=(1 << 64) - 1), max_size=300
)


@given(uint64s)
@settings(max_examples=200)
def test_vbyte_roundtrip(vals):
    assert list(vbyte_decode(vbyte_encode(vals))) == vals


@given(st.lists(st.lists(st.integers(min_value=0, max_value=(1 << 63)), max_size=40), max_size=20))
@settings(max_examples=100)
def test_vbyte_chunked_equals_per_group(groups):
    flat = [v for g in groups for v in g]
    counts = [len(g) for g in groups]
    chunks = vbyte_encode_chunked(np.array(flat, dtype=np.uint64), counts)
    assert chunks == [vbyte_encode(g) for g in groups]


@given(
    st.lists(
        st.integers(min_value=0, max_value=1 << 40), min_size=1, max_size=200
    )
)
@settings(max_examples=100)
def test_delta_roundtrip(ids):
    ids = sorted(set(ids))
    first, buf = delta_encode(np.array(ids, dtype=np.int64))
    assert list(delta_decode(first, buf, len(ids))) == ids


@given(st.text(max_size=400))
@settings(max_examples=150)
def test_tokenizer_total_and_lower(text):
    toks = tokenize_str(text)
    assert all(t == t.lower() and t for t in toks)
    # re-tokenizing the joined tokens is a fixed point
    assert tokenize_str(" ".join(toks)) == toks


@given(st.text(max_size=300))
@settings(max_examples=100)
def test_extract_text_total(html):
    out = extract_text_str(html)
    assert out == " ".join(out.split())  # normalized whitespace, no crash


_word = st.text(
    alphabet="abcdefghij", min_size=1, max_size=6
)
_doc = st.lists(_word, min_size=1, max_size=40).map(" ".join)


@given(st.lists(_doc, min_size=2, max_size=12), st.lists(_word, min_size=1, max_size=3))
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_brute_bm25_matches_python_oracle(spark, texts, query_terms):
    """Engine DataFrame BM25 == pure-python oracle on arbitrary tiny corpora."""
    import pandas as pd

    from solr_indexing_spark.query.brute import bm25_topk

    pdf = pd.DataFrame(
        {
            "url": [f"u{i:04d}" for i in range(len(texts))],
            "text": texts,
        }
    )
    oracle = OracleIndex(pdf)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pdf["text"])], "doc_id long, text string"
    )
    q = " ".join(query_terms)
    got = [
        (r["doc_id"], r["score"]) for r in bm25_topk(docs, q, k=10).collect()
    ]
    exp = oracle.topk(q, 10)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (_, gs), (_, es) in zip(got, exp):
        assert abs(gs - es) < 1e-6
