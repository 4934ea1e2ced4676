"""Property-based check of the BMW kernel (no Spark): random corpora,
random sharding — exact agreement with the dict-oracle scorer."""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from solr_indexing_spark import B, K1
from solr_indexing_spark.codec import vbyte_encode
from solr_indexing_spark.indexing.build import tf_norm
from solr_indexing_spark.query.bmw import _INF, _TermCursor, bmw_shard_topk


def _mk_corpus(rng: np.random.Generator, n_docs: int, vocab: int):
    postings: dict[str, dict[int, int]] = defaultdict(dict)
    doclen = {}
    for d in range(n_docs):
        n_terms = int(rng.integers(1, 12))
        tf_total = 0
        for _ in range(n_terms):
            t = f"t{int(rng.integers(0, vocab))}"
            tf = int(rng.integers(1, 6))
            postings[t][d] = postings[t].get(d, 0) + tf
            tf_total += tf
        doclen[d] = tf_total
    return postings, doclen


def _blocks(plist, doclen, avgdl, block_size):
    items = sorted(plist.items())
    ids = np.array([d for d, _ in items], dtype=np.int64)
    tfs = np.array([t for _, t in items], dtype=np.int64)
    dls = np.array([doclen[d] for d in ids], dtype=np.int64)
    norms = tf_norm(tfs, dls.astype(float), avgdl)
    out = []
    for lo in range(0, len(ids), block_size):
        hi = min(lo + block_size, len(ids))
        out.append(
            (
                int(ids[lo]),
                int(ids[hi - 1]),
                hi - lo,
                vbyte_encode(np.diff(ids[lo:hi]).astype(np.uint64)),
                vbyte_encode(tfs[lo:hi].astype(np.uint64)),
                vbyte_encode(dls[lo:hi].astype(np.uint64)),
                float(norms[lo:hi].max()),
            )
        )
    return out


def _oracle_topk(postings, doclen, n_docs, avgdl, terms, k):
    scores: dict[int, float] = {}
    for t in sorted(set(terms)):
        plist = postings.get(t)
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for d, tf in plist.items():
            dl = doclen[d]
            scores[d] = scores.get(d, 0.0) + idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * dl / avgdl)
            )
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_docs=st.integers(5, 400),
    vocab=st.integers(2, 30),
    block_size=st.sampled_from([4, 16, 128]),
    shard_range=st.sampled_from([16, 64, 1 << 20]),
    k=st.sampled_from([1, 5, 10]),
)
def test_bmw_kernel_matches_oracle(seed, n_docs, vocab, block_size, shard_range, k):
    rng = np.random.default_rng(seed)
    postings, doclen = _mk_corpus(rng, n_docs, vocab)
    avgdl = sum(doclen.values()) / n_docs
    q_terms = [f"t{int(rng.integers(0, vocab + 2))}" for _ in range(int(rng.integers(1, 5)))]

    want = _oracle_topk(postings, doclen, n_docs, avgdl, q_terms, k)

    shard_map: dict[int, dict[str, list]] = defaultdict(dict)
    meta = {}
    for t in sorted(set(q_terms)):
        plist = postings.get(t)
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        blks = _blocks(plist, doclen, avgdl, block_size)
        meta[t] = (idf, idf * max(b[6] for b in blks))
        for b in blks:
            for s in range(b[0] // shard_range, b[1] // shard_range + 1):
                shard_map[s].setdefault(t, []).append(b)

    cands = []
    for s, tb in shard_map.items():
        lo, hi = s * shard_range, (s + 1) * shard_range
        cursors = []
        for t in sorted(tb):
            idf, ub = meta[t]
            c = _TermCursor(idf, ub, tb[t], lo, hi)
            if c.cur < _INF:
                cursors.append(c)
        cands.extend(bmw_shard_topk(cursors, k, avgdl))
    got = sorted(cands, key=lambda kv: (-kv[1], kv[0]))[:k]

    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-9


@settings(max_examples=60, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n_docs=st.integers(5, 400),
    vocab=st.integers(2, 30),
    block_size=st.sampled_from([4, 16, 128]),
    shard_range=st.sampled_from([16, 64, 1 << 20]),
    k=st.sampled_from([1, 5, 10]),
    n_dead=st.integers(0, 20),
)
def test_taat_kernel_matches_wand_and_oracle(
    seed, n_docs, vocab, block_size, shard_range, k, n_dead
):
    """The vectorized term-at-a-time kernel and the auto-switch must agree
    with the WAND kernel and the dict oracle exactly (ids identical,
    scores to 1e-9), dead sets included."""
    from solr_indexing_spark.query.bmw import shard_topk_auto, taat_shard_topk

    rng = np.random.default_rng(seed)
    postings, doclen = _mk_corpus(rng, n_docs, vocab)
    avgdl = sum(doclen.values()) / n_docs
    q_terms = [
        f"t{int(rng.integers(0, vocab + 2))}"
        for _ in range(int(rng.integers(1, 5)))
    ]
    dead = frozenset(
        int(d) for d in rng.integers(0, n_docs, size=n_dead)
    )

    scores: dict[int, float] = {}
    for t in sorted(set(q_terms)):
        plist = postings.get(t)
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        for d, tf in plist.items():
            if d in dead:
                continue
            dl = doclen[d]
            scores[d] = scores.get(d, 0.0) + idf * tf * (K1 + 1) / (
                tf + K1 * (1 - B + B * dl / avgdl)
            )
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    shard_map: dict[int, dict[str, list]] = defaultdict(dict)
    meta = {}
    for t in sorted(set(q_terms)):
        plist = postings.get(t)
        if not plist:
            continue
        df = len(plist)
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        blks = _blocks(plist, doclen, avgdl, block_size)
        meta[t] = (idf, idf * max(b[6] for b in blks))
        for b in blks:
            for s in range(b[0] // shard_range, b[1] // shard_range + 1):
                shard_map[s].setdefault(t, []).append(b)

    for kernel in ("taat", "auto"):
        cands = []
        for s, tb in shard_map.items():
            lo, hi = s * shard_range, (s + 1) * shard_range
            cursors = []
            for t in sorted(tb):
                idf, ub = meta[t]
                c = _TermCursor(idf, ub, tb[t], lo, hi)
                if c.cur < _INF:
                    cursors.append(c)
            if kernel == "taat":
                cands.extend(
                    taat_shard_topk(cursors, k, avgdl, dead=dead, lo=lo, hi=hi)
                )
            else:
                cands.extend(
                    shard_topk_auto(cursors, k, avgdl, dead=dead, lo=lo, hi=hi)
                )
        got = sorted(cands, key=lambda kv: (-kv[1], kv[0]))[:k]
        assert [d for d, _ in got] == [d for d, _ in want], kernel
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9
