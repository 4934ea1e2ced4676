"""Deduplication operators for large-scale training-data pipelines.

Beyond-reference operators (the reference has no dedup — the closest analog
is its first-wins in-document dedup, ``objClassifications.some(...)`` at
solrIndexCreation.ts:1963-1974, re-expressed in docprep/enrich). These are
the corpus-level stages a 100 TB web-text pipeline runs before indexing:

- exact dedup: content-fingerprint groupBy (one shuffle on a 60-bit hash —
  uniform keys, no skew).
- n-gram Jaccard: exact pairwise similarity via a shingle-equijoin (the
  verify stage; quadratic within shingle-buckets only).
- MinHash + LSH: signature → band → bucket-join candidate generation
  (Broder 1997; the scale path — candidate count is data-dependent, not
  quadratic).
- SimHash: per-doc weighted bit-vote hash (Charikar 2002); near-dups are
  small-Hamming-distance pairs found via band join.
- embedding cosine: near-dup pairs above a cosine threshold, bucketed by a
  sign-LSH so the pair join is not all-pairs.

All hash primitives are md5-based (``analysis.md5_prefix_long``) so every
operator is reproducible across engines — the driver's DuckDB oracle
recomputes identical signatures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .analysis import doc_fingerprint, md5_prefix_long, sql_tokens


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles of the text (array<string>).

    Short documents (< n tokens) yield their full token join as the one
    shingle, so every non-empty doc has at least one.
    """
    toks = sql_tokens(col)
    cnt = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(cnt - (n - 1), F.lit(1)))
    return F.when(cnt == 0, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        )
    )


# --- exact dedup ----------------------------------------------------------


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep one representative (min id) per identical normalized text.

    One shuffle on the 60-bit fingerprint — uniform key distribution, so
    no salting needed even when one document dominates the corpus.
    Adds ``fingerprint`` and ``dup_count`` to the surviving rows.
    """
    fp = df.withColumn("fingerprint", doc_fingerprint(F.col(text_col)))
    w = Window.partitionBy("fingerprint")
    return (
        fp.withColumn("dup_count", F.count("*").over(w))
        .withColumn("_rk", F.row_number().over(w.orderBy(F.col(id_col))))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


def exact_dup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(fingerprint, dup_count, keep_id) for groups with >1 member —
    the audit view of exact_dedup."""
    return (
        df.select(
            doc_fingerprint(F.col(text_col)).alias("fingerprint"),
            F.col(id_col),
        )
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("dup_count"),
            F.min(id_col).alias("keep_id"),
        )
        .filter(F.col("dup_count") > 1)
    )


# --- n-gram Jaccard (exact pairwise, shingle-bucketed) --------------------


def jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >= 1 shingle.

    Plan shape: explode distinct shingles → self-equijoin on shingle
    (co-partitioned by shingle hash, so only docs that actually share
    content ever meet) → count common → jaccard. Output:
    (id_a, id_b, common, size_a, size_b, jaccard) with id_a < id_b.

    At web scale this is the *verify* stage run on LSH candidates, not on
    the full corpus; on its own it is quadratic only within shingle groups.
    """
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(shingles(text_col, shingle_n)).alias("sh")
    )
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.col("size_a") + F.col("size_b") - F.col("common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")
    )
    return out


# --- MinHash + LSH --------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    num_hashes: int = 8,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, mh0..mh{H-1}): per-doc MinHash signature.

    One explode + one groupBy(id) with H min-aggregates — a single shuffle
    keyed on doc id (uniform). Hash family: md5('{i}:' || shingle) 60-bit
    prefixes — independent enough for Jaccard estimation, reproducible in
    any engine with md5.
    """
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(text_col, shingle_n)).alias("sh"),
    )
    aggs = [
        F.min(md5_prefix_long(F.col("sh"), seed=str(i))).alias(f"mh{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def lsh_candidate_pairs(
    sigs: DataFrame, bands: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """LSH banding: docs agreeing on ALL rows of >= 1 band become a
    candidate pair (id_a < id_b, distinct).

    Plan shape: unpivot signatures into (band_key, id) → self-join within
    band key → distinct pairs. Band keys are md5-combined so the join key
    is a single uniform 60-bit int. Candidate volume scales with actual
    similarity mass, never |corpus|² — the property that lets this run at
    10^12 docs.
    """
    band_rows = []
    for b in range(bands):
        cols = [f"mh{b * rows_per_band + r}" for r in range(rows_per_band)]
        key = md5_prefix_long(
            F.concat_ws("_", F.lit(str(b)), *[F.col(c).cast("string") for c in cols])
        )
        band_rows.append(sigs.select(F.col("id"), key.alias("band_key")))
    banded = band_rows[0]
    for extra in band_rows[1:]:
        banded = banded.unionByName(extra)
    a, b_ = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Full MinHash-LSH pipeline: signatures → band candidates → exact
    Jaccard verify on candidates only. Returns verified pairs
    (id_a, id_b, jaccard >= threshold)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, num_hashes, shingle_n, text_col, id_col)
    cands = lsh_candidate_pairs(sigs, bands, rows_per_band)
    # verify CANDIDATES ONLY: join each pair to its two shingle sets and
    # intersect in-row (array_intersect) — never the all-pairs shingle
    # self-join, so verify cost is O(candidates), the property that makes
    # MinHash-LSH the 10^12-doc path.
    sh = df.select(
        F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard",
            F.round(
                F.col("common")
                / (F.size("sh_a") + F.size("sh_b") - F.col("common")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --- SimHash --------------------------------------------------------------


def simhash(
    df: DataFrame,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, simhash): Charikar bit-vote hash over tf-weighted tokens.

    Each distinct token hashes to a ``bits``-wide pattern; bit b of the
    document hash is 1 iff the tf-weighted vote sum for that bit is > 0.
    Plan: explode → groupBy(id, term) tf → groupBy(id) with ``bits``
    conditional-sum aggregates — two shuffles, both on uniform keys.
    16 bits keeps the oracle SQL tractable; the production call can use 64.
    """
    tf = (
        df.select(F.col(id_col).alias("id"), F.explode(sql_tokens(text_col)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", md5_prefix_long(F.col("term")))
    )
    votes = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"v{b}")
        for b in range(bits)
    ]
    voted = tf.groupBy("id").agg(*votes)
    packed = None
    for b in range(bits):
        term = F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        packed = term if packed is None else packed + term
    return voted.select("id", packed.cast("long").alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    bits: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Candidate generation: split the hash into 2 half-words; by pigeonhole
    any pair within distance <= bits/2-ish shares at least one exact half,
    so the join is equi on half-words, never all-pairs. Exact Hamming
    (bit_count of xor) filters candidates.
    """
    s = simhash(df, bits, text_col, id_col)
    half = bits // 2
    lo_mask = (1 << half) - 1
    banded = s.select(
        "id", "simhash", F.col("simhash").bitwiseAND(F.lit(lo_mask)).alias("band_key"),
        F.lit(0).alias("band"),
    ).unionByName(
        s.select(
            "id", "simhash",
            F.shiftright("simhash", half).bitwiseAND(F.lit(lo_mask)).alias("band_key"),
            F.lit(1).alias("band"),
        )
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- embedding cosine near-dups ------------------------------------------


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float/double> columns, pure Catalyst
    (zip_with + aggregate higher-order functions — no UDF)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    planes: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Near-duplicate vector pairs (cosine >= threshold), sign-LSH bucketed.

    Bucket key = sign pattern under ``planes`` deterministic pseudo-random
    hyperplanes (weights ±1 from bit p of md5(dim index) — reproducible,
    no stored model). Only same-bucket pairs are compared; raise ``planes``
    to shrink buckets as the corpus grows. Exact cosine verifies.
    """
    v = F.col(vec_col)
    dims = F.sequence(F.lit(0), F.size(v) - 1)
    proj_bits = []
    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                v,
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
        proj_bits.append(F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0)))
    bucket = proj_bits[0]
    for t in proj_bits[1:]:
        bucket = bucket + t
    tagged = emb.select(
        F.col(id_col).alias("id"), v.alias("vec"), bucket.alias("bucket")
    )
    a, b = tagged.alias("a"), tagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(cosine(F.col("a.vec"), F.col("b.vec")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


# --- survivor selection: connected components over the pair graph ----------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """(id, component_id) — min-id connected components over an undirected
    pair graph: the step that turns any near-dup operator's PAIRS into the
    per-cluster drop list a dedup pipeline actually ships.

    Algorithm: alternating neighbor-min propagation + pointer doubling
    (path compression), pure DataFrames — no GraphFrames dependency:

    1. ``comp(u) = min(u, Γ(u))`` seed;
    2. per round: ``comp'(u) = min(comp(u), min over (u,v) of comp(v))``
       (one edge join + groupBy), then ``comp''(u) = comp(comp'(u))``
       (one self-join) — the compression step is what makes long chains
       converge in O(log n) rounds instead of O(diameter);
    3. stop when ``sum(comp)`` is unchanged (component ids only ever
       decrease, so an unchanged sum means a fixed point — one scalar agg
       per round, no row-level diff join).

    Each round ends in ``localCheckpoint`` — lineage stays O(1) deep, so
    the plan never grows with iterations (the classic iterative-DataFrame
    failure mode). All joins/aggs key on node id — uniform, shuffle-
    friendly; a giant component is fine because no task ever holds a
    whole component, only a node's direct neighbor set.

    Only nodes that appear in ``pairs`` are emitted; singletons are their
    own survivors by definition (see :func:`near_dup_survivors`).
    """
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .unionByName(
            pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    comp = (
        edges.groupBy("a")
        .agg(F.min("b").alias("nmin"))
        .select(
            F.col("a").alias("id"),
            F.least(F.col("a"), F.col("nmin")).alias("comp"),
        )
        .localCheckpoint()
    )
    prev_sum = comp.agg(F.sum("comp")).collect()[0][0]
    for _ in range(max_iter):
        nbr = (
            edges.join(
                comp.select(F.col("id").alias("b"), "comp"), "b"
            )
            .groupBy("a")
            .agg(F.min("comp").alias("ncomp"))
        )
        step = (
            comp.join(nbr.withColumnRenamed("a", "id"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("comp"), F.coalesce("ncomp", "comp")
                ).alias("comp"),
            )
        )
        # pointer doubling: comp(u) <- comp(comp(u)); comp values are node
        # ids, so the lookup side is the assignment itself
        lookup = step.select(
            F.col("id").alias("comp"), F.col("comp").alias("cc")
        )
        comp = (
            step.join(lookup, "comp", "left")
            .select("id", F.coalesce("cc", "comp").alias("comp"))
            .localCheckpoint()
        )
        cur_sum = comp.agg(F.sum("comp")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    edges.unpersist()
    return comp.withColumnRenamed("comp", "component_id")


def near_dup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(doc_id, component_id, keep) over ALL of ``df`` — the shippable
    dedup verdict: transitive closure of the near-dup pairs, min-id
    survivor per component, singletons keep themselves. ``keep`` is int
    (1 = survivor) so the frame drops straight into a filter or a join.
    """
    comps = connected_components(pairs, id_a=id_a, id_b=id_b)
    return (
        df.select(F.col(id_col).cast("long").alias("doc_id"))
        .join(
            comps.select(
                F.col("id").alias("doc_id"), "component_id"
            ),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("component_id", "doc_id").alias("component_id"),
            F.when(
                F.coalesce("component_id", "doc_id") == F.col("doc_id"), 1
            )
            .otherwise(0)
            .alias("keep"),
        )
    )
