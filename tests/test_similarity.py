"""ANN similarity search: brute-force oracle, LSH recall, IVF correctness."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.similarity import (
    cosine_topk,
    cosine_topk_by_id,
    ivf_topk,
    lsh_bucket,
    lsh_topk,
    train_centroids,
)

DIM = 16
N = 300


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    # clustered vectors so ANN structure is non-trivial
    centers = rng.normal(size=(6, DIM))
    rows = []
    for i in range(N):
        c = centers[i % 6]
        v = c + rng.normal(scale=0.3, size=DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.array([r["embedding"] for r in rows])


def _numpy_topk(emb_np, q, k):
    sims = emb_np @ q / (np.linalg.norm(emb_np, axis=1) * np.linalg.norm(q))
    order = sorted(range(len(sims)), key=lambda i: (-round(sims[i], 4), i))
    return order[:k]


def test_brute_matches_numpy_oracle(emb, emb_np):
    q = [float(x) for x in emb_np[7]]
    got = [r["id"] for r in cosine_topk(emb, q, k=10).collect()]
    assert got == _numpy_topk(emb_np, np.array(q), 10)


def test_topk_by_id_excludes_self(emb, emb_np):
    got = [r["id"] for r in cosine_topk_by_id(emb, 7, k=10).collect()]
    expect = [i for i in _numpy_topk(emb_np, emb_np[7], 11) if i != 7][:10]
    assert got == expect


def test_lsh_recall(emb, emb_np):
    """Multiprobe sign-LSH recall@10 over several queries — approximate, but
    must stay well above chance (10/300) and always find the query itself."""
    recalls = []
    for qid in [0, 5, 50, 123, 222]:
        q = [float(x) for x in emb_np[qid]]
        exact = set(_numpy_topk(emb_np, emb_np[qid], 10))
        approx = {r["id"] for r in lsh_topk(emb, q, k=10, planes=6).collect()}
        assert qid in approx, "query vector must land in its own bucket"
        recalls.append(len(exact & approx) / 10)
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_lsh_bucket_stability(emb):
    """Bucket assignment is deterministic and within range."""
    a = emb.select(lsh_bucket(F.col("embedding"), 6).alias("b")).collect()
    b = emb.select(lsh_bucket(F.col("embedding"), 6).alias("b")).collect()
    assert a == b
    assert all(0 <= r["b"] < 64 for r in a)


def test_ivf_full_probe_equals_brute(emb, emb_np):
    cents = train_centroids(emb, n_centroids=6, iters=2)
    q = [float(x) for x in emb_np[33]]
    exact = [r["id"] for r in cosine_topk(emb, q, k=10).collect()]
    full = [
        r["id"] for r in ivf_topk(emb, q, cents, k=10, nprobe=6).collect()
    ]
    assert full == exact


def test_ivf_nprobe_recall(emb, emb_np):
    cents = train_centroids(emb, n_centroids=6, iters=3)
    hits = 0
    for qid in [3, 40, 77]:
        q = [float(x) for x in emb_np[qid]]
        exact = set(_numpy_topk(emb_np, emb_np[qid], 10))
        approx = {
            r["id"] for r in ivf_topk(emb, q, cents, k=10, nprobe=2).collect()
        }
        hits += len(exact & approx)
    assert hits / 30 >= 0.5


def test_assign_cells_kernels_agree(spark, emb, emb_np):
    """Both assignment kernels must match a driver-side numpy argmin; the
    Arrow matmul path is the large-C shape (the when-chain's nested
    conditional tree grows super-linearly with C and cannot be built at
    hundreds of centroids — which is exactly why the kernel switch
    exists)."""
    import random

    import numpy as np

    from solr_indexing_spark.similarity import (
        NEAREST_CELL_CODEGEN_MAX,
        assign_cells,
        train_centroids,
    )

    mat = np.asarray(emb_np, dtype=np.float64)
    ids = list(range(len(mat)))  # fixture rows are ordered by vec_id

    def expected(cents):
        c = np.asarray(cents, dtype=np.float64)
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        return dict(zip(ids, d.argmin(axis=1)))

    cents = train_centroids(emb, n_centroids=8, iters=1)
    want8 = expected(cents)
    a = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(emb, cents, method="codegen").collect()
    }
    b = {
        r["vec_id"]: r["cell"]
        for r in assign_cells(emb, cents, method="arrow").collect()
    }
    assert a == want8 and b == want8
    # large synthetic centroid set: auto must route to arrow and agree
    # with the driver-side argmin
    rng = random.Random(3)
    dim = mat.shape[1]
    big = [
        [rng.uniform(-1, 1) for _ in range(dim)]
        for _ in range(NEAREST_CELL_CODEGEN_MAX + 6)
    ]
    got = {
        r["vec_id"]: r["cell"] for r in assign_cells(emb, big).collect()
    }
    assert got == expected(big)
