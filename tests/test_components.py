"""Connected components / survivor selection (docprep/dedup.py) — the
pairs → drop-list step of a corpus dedup: min-id transitive closure over
near-dup pairs, checked against a driver-side union-find."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.docprep.dedup import (
    connected_components,
    near_dup_survivors,
)


def _union_find(n_nodes, edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min id per component over nodes seen in edges
    comp = {}
    for a, b in edges:
        for x in (a, b):
            comp[x] = find(x)
    # path-compress fully
    return {x: find(x) for x in comp}


def _run(spark, edges):
    pairs = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {
        r["id"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    return got


def test_components_path_graph(spark):
    """A 200-node chain — the adversarial diameter case: pointer doubling
    must converge (min id propagates the whole path), not just 1-hop."""
    edges = [(i, i + 1) for i in range(200)]
    got = _run(spark, edges)
    assert got == {i: 0 for i in range(201)}


def test_components_giant_star_plus_clusters(spark):
    """One giant component (hub 5000 with 400 spokes — the skew case) next
    to small clusters; no task ever needs the whole component."""
    edges = [(5000, 5001 + i) for i in range(400)]
    edges += [(1, 2), (2, 3), (10, 11)]
    got = _run(spark, edges)
    want = _union_find(None, edges)
    assert got == want
    assert got[5400] == 5000 and got[3] == 1


@pytest.mark.parametrize("seed", [1, 7])
def test_components_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(100))
    edges = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(60)
        }
    )
    got = _run(spark, edges)
    assert got == _union_find(None, edges)


def test_near_dup_survivors_full_corpus(spark):
    """Every doc gets a verdict: clustered docs keep only the min id,
    singletons keep themselves."""
    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 5), (5, 9), (2, 3)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: (r["component_id"], r["keep"])
        for r in near_dup_survivors(docs, pairs).collect()
    }
    assert len(rows) == 12
    assert rows[0] == (0, 1) and rows[5] == (0, 0) and rows[9] == (0, 0)
    assert rows[2] == (2, 1) and rows[3] == (2, 0)
    for d in (1, 4, 6, 7, 8, 10, 11):
        assert rows[d] == (d, 1)
    # the drop list a pipeline ships: filter keep=1 leaves one per cluster
    kept = {d for d, (c, k) in rows.items() if k}
    assert kept == {0, 1, 2, 4, 6, 7, 8, 10, 11}
