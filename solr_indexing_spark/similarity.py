"""Similarity search over embedding columns (array<float>).

Beyond-reference operators for the training-data side of the engine: the
reference's retrieval is lexical (BM25, delegated to Solr); modern corpus
pipelines also need vector neighbor search for near-dup mining and
retrieval-augmented filtering.

Three tiers, same semantics, increasing scale:

- ``cosine_topk`` — brute-force exact top-k: one scan, one narrow map
  (zip_with/aggregate, pure Catalyst), one global top-k. The baseline and
  the oracle for the approximate paths.
- ``lsh_topk`` — sign-LSH bucketed: deterministic hyperplane signs put each
  vector in one of 2^planes buckets; only the query's bucket (plus optional
  multi-probe neighbors at Hamming distance 1) is scanned. Recall is
  tunable via planes/probes; per-query cost drops by the bucket fanout.
- ``ivf_topk`` — IVF-style coarse quantizer: vectors are assigned to the
  nearest of C centroids (a broadcast list); queries scan only ``nprobe``
  nearest cells. Centroids come from ``train_centroids`` (k-means—one
  Spark-side Lloyd iteration loop over DataFrames, no MLlib dependency).

At 100 TB the bucketed/IVF paths are partition-pruned scans: the bucket /
cell id is a partition column of the stored embedding table, so Spark reads
only the probed cells' files.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .docprep.analysis import md5_prefix_long
from .docprep.dedup import cosine


def _vec_lit(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine similarity to a literal query vector.

    (id, cos) ordered by (cos desc, id asc) — deterministic tie-break, same
    contract as the BM25 top-k. The scan is embarrassingly parallel; the
    only shuffle is the final k-row merge.
    """
    q = _vec_lit(query_vec)
    return (
        emb.select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), q), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


def cosine_topk_by_id(
    emb: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors of an in-table vector (excluding itself),
    without collecting the query vector to the driver: a broadcast
    self-join against the single query row."""
    q = F.broadcast(
        emb.filter(F.col(id_col) == query_id).select(
            F.col(vec_col).alias("_qvec")
        )
    )
    return (
        emb.filter(F.col(id_col) != query_id)
        .crossJoin(q)
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), F.col("_qvec")), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


# --- sign-LSH bucketed ANN ------------------------------------------------


def lsh_bucket(vec: Column, planes: int = 8) -> Column:
    """Sign pattern under ``planes`` deterministic ±1 hyperplanes (weights
    from md5 bit of the dimension index — no stored model, any engine can
    recompute). Returns int bucket in [0, 2^planes)."""
    dims = F.sequence(F.lit(0), F.size(vec) - 1)
    bucket = F.lit(0)
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                dims,
                lambda x, d: F.when(
                    md5_prefix_long(d.cast("string"), seed=f"plane{p}")
                    .bitwiseAND(F.lit(1))
                    == 1,
                    x,
                ).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def _bucket_of(vec: list[float], planes: int) -> int:
    """Driver-side twin of lsh_bucket for a literal query vector."""
    import hashlib

    bucket = 0
    for p in range(planes):
        acc = 0.0
        for d, x in enumerate(vec):
            h = int(hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()[:15], 16)
            acc += x if (h & 1) == 1 else -x
        if acc > 0:
            bucket |= 1 << p
    return bucket


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int = 8,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bucket_col: str | None = None,
) -> DataFrame:
    """Approximate top-k: scan only the query's LSH bucket (plus, with
    ``multiprobe``, the ``planes`` buckets at Hamming distance 1 — the
    standard recall repair).

    If the table was written partitioned by a precomputed bucket column
    (pass ``bucket_col``), the `.isin(probes)` filter becomes partition
    pruning and only those files are read.
    """
    qb = _bucket_of(query_vec, planes)
    probes = [qb] + ([qb ^ (1 << p) for p in range(planes)] if multiprobe else [])
    bcol = F.col(bucket_col) if bucket_col else lsh_bucket(F.col(vec_col), planes)
    q = _vec_lit(query_vec)
    return (
        emb.withColumn("_bucket", bcol)
        .filter(F.col("_bucket").isin(probes))
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), q), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )


# --- IVF-style coarse quantizer ------------------------------------------


def train_centroids(
    emb: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_stride: int | None = None,
) -> list[list[float]]:
    """Lloyd's k-means on DataFrames (no MLlib): init = deterministic
    hash-stride sample pushed into the scan (only ~C rows ever reach the
    driver — never O(n)); each iteration is one assign (broadcast
    centroids, narrow) + one groupBy(cell) mean.
    Returns driver-side centroid list (C × dim floats — tiny)."""
    n = emb.count()
    stride = seed_stride or max(1, n // n_centroids)
    # Deterministic scan-side filter: rows whose id hashes into the stride
    # class survive (≈ n/stride ≈ C rows), then take the C smallest ids for
    # stability. The filter + limit run on executors; the driver sees ≤ C rows.
    seeds = (
        emb.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(stride)) == 0)
        .orderBy(id_col)
        .select(vec_col)
        .limit(n_centroids)
        .collect()
    )
    if len(seeds) < n_centroids:  # tiny tables / unlucky hash class
        seeds = emb.orderBy(id_col).select(vec_col).limit(n_centroids).collect()
    centroids = [list(map(float, r[0])) for r in seeds]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = assign_cells(
            emb.select(F.col(vec_col).alias("v")), centroids, vec_col="v"
        )
        sums = assigned.groupBy("cell").agg(
            *[
                F.sum(F.element_at("v", d + 1)).alias(f"s{d}")
                for d in range(dim)
            ],
            F.count("*").alias("n"),
        )
        new = {
            r["cell"]: [r[f"s{d}"] / r["n"] for d in range(dim)]
            for r in sums.collect()
        }
        centroids = [new.get(c, centroids[c]) for c in range(len(centroids))]
    return centroids


def _nearest_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin over centroids of squared L2 distance — an unrolled when-chain
    (C is small; stays in codegen)."""
    best_d, best_i = None, None
    for i, c in enumerate(centroids):
        cvec = _vec_lit(c)
        d = F.aggregate(
            F.zip_with(vec, cvec, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        if best_d is None:
            best_d, best_i = d, F.lit(i)
        else:
            cond = d < best_d
            best_i = F.when(cond, F.lit(i)).otherwise(best_i)
            best_d = F.when(cond, d).otherwise(best_d)
    return best_i


#: above this centroid count the when-chain stops being the right codegen
#: shape (the unrolled chain grows O(C) comparisons per row inside one
#: generated method and trips janino's 64 KB limit around C≈1k) — switch
#: to the Arrow matmul kernel.
NEAREST_CELL_CODEGEN_MAX = 64


def assign_cells(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
    method: str = "auto",
) -> DataFrame:
    """Nearest-centroid assignment for every row — the IVF quantizer's
    hot map, with a cost-based kernel choice (same policy as the BMW/TAAT
    scorer switch):

    - ``codegen`` (C ≤ 64): the unrolled when-chain — whole-stage codegen,
      zero Python.
    - ``arrow`` (large C): one vectorized pandas UDF per Arrow batch —
      ``argmin(-2·X·Cᵀ + |c|²)`` as a numpy matmul (the |x|² term is
      row-constant, dropped). A 10k-row batch against 4096 centroids is
      ONE BLAS call instead of 4096 generated comparisons per row; this
      is the kernel an IVF index at corpus scale actually runs.

    Ties resolve to the lowest cell index on both paths (strict < in the
    chain; numpy argmin picks the first minimum)."""
    c_n = len(centroids)
    if method == "auto":
        method = "codegen" if c_n <= NEAREST_CELL_CODEGEN_MAX else "arrow"
    if method == "codegen":
        return emb.withColumn(
            out_col, _nearest_cell(F.col(vec_col), centroids)
        )
    from pyspark.sql.functions import pandas_udf

    cents = np.asarray(centroids, dtype=np.float64)
    cn = (cents**2).sum(axis=1)

    @pandas_udf("int")
    def _argmin(v: pd.Series) -> pd.Series:
        x = np.asarray([np.asarray(row, dtype=np.float64) for row in v])
        d = x @ cents.T * -2.0 + cn
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return emb.withColumn(out_col, _argmin(F.col(vec_col)))


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str | None = None,
) -> DataFrame:
    """IVF search: scan only the ``nprobe`` cells whose centroids are
    nearest the query. With the table partitioned by precomputed ``cell``
    (pass ``cell_col``) this is pure partition pruning."""
    import math

    dists = [
        (i, math.sqrt(sum((x - y) ** 2 for x, y in zip(query_vec, c))))
        for i, c in enumerate(centroids)
    ]
    probe_cells = [i for i, _ in sorted(dists, key=lambda t: t[1])[:nprobe]]
    if cell_col:
        emb = emb.withColumn("_cell", F.col(cell_col))
    else:
        emb = assign_cells(emb, centroids, vec_col=vec_col, out_col="_cell")
    q = _vec_lit(query_vec)
    return (
        emb.filter(F.col("_cell").isin(probe_cells))
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine(F.col(vec_col), q), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), F.asc("id"))
        .limit(k)
    )
