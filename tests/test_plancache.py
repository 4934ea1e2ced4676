"""Analyzed-plan cache (solr_indexing_spark/plancache.py) — the cache must
be invisible: identical rows/schema to a live build, transparent fallback
on any blob problem, and key sensitivity to every behavior-changing input.

The driver's value-hash oracle gate runs THROUGH this cache (the dp_*
assemblies are decorated), so these tests pin the equality locally before
the gate ever sees a spliced plan.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark import plancache
from solr_indexing_spark.docprep.pipelines import (
    CASE_LAWS_INPUT_COLUMNS,
    case_laws_document,
    ensure_columns,
)


def _packed(spark, n=40, body="Body"):
    df = spark.range(n).select(
        F.concat(F.lit("M"), F.col("id").cast("string")).alias("id"),
        F.concat(F.lit("S"), F.col("id").cast("string")).alias("mid"),
        F.lit("Case Laws").alias("documenttype"),
        F.concat(
            F.lit("<document><p>"), F.lit(body),
            F.col("id").cast("string"), F.lit("</p></document>"),
        ).alias("fullcontent"),
        F.lit("20200101^01-01-2020").alias("documentdate"),
        F.concat(F.lit("Case "), F.col("id").cast("string")).alias("Heading"),
    )
    return ensure_columns(df, CASE_LAWS_INPUT_COLUMNS)


def _rows(df):
    return sorted(
        df.select("id", "heading", "fullcontent", "documentdate").collect()
    )


@pytest.fixture()
def cache_dir(tmp_path):
    return str(tmp_path / "plans")


def test_cached_matches_live(spark, cache_dir):
    """Write a blob, splice it onto a FRESH DataFrame (new exprIds), and
    compare against an uncached live build: rows and schema identical."""
    build = case_laws_document.__wrapped__
    live = build(_packed(spark), templateid="T")

    # miss + write (explicit cache_dir always writes)
    first = plancache.cached_transform(
        "t_case_laws", (("templateid", "T"),), _packed(spark),
        lambda d: build(d, templateid="T"), cache_dir=cache_dir,
    )
    assert len(os.listdir(cache_dir)) == 1
    # hit: fresh input plan, different exprIds than at write time
    hit = plancache.cached_transform(
        "t_case_laws", (("templateid", "T"),), _packed(spark),
        lambda d: build(d, templateid="T"), cache_dir=cache_dir,
    )
    assert hit.schema == live.schema
    assert _rows(hit) == _rows(live) == _rows(first)


def test_hit_reflects_new_input_data(spark, cache_dir):
    """The spliced chain must read the NEW input's rows, not anything
    captured at write time."""
    build = case_laws_document.__wrapped__
    plancache.cached_transform(
        "t_case_laws", (), _packed(spark, body="Old"),
        lambda d: build(d), cache_dir=cache_dir,
    )
    hit = plancache.cached_transform(
        "t_case_laws", (), _packed(spark, body="New"),
        lambda d: build(d), cache_dir=cache_dir,
    )
    texts = [r.fullcontent for r in hit.limit(5).collect()]
    assert texts and all("New" in t for t in texts)
    assert not any("Old" in t for t in texts)


def test_corrupt_blob_falls_back_live(spark, cache_dir):
    build = case_laws_document.__wrapped__
    df = _packed(spark)
    fp = plancache._fingerprint("t_case_laws", (), df.schema.json())
    os.makedirs(cache_dir)
    with open(os.path.join(cache_dir, f"t_case_laws-{fp}.plan.gz"), "wb") as f:
        f.write(b"not a gzip blob")
    out = plancache.cached_transform(
        "t_case_laws", (), df, lambda d: build(d), cache_dir=cache_dir
    )
    assert _rows(out) == _rows(build(_packed(spark)))


def test_fingerprint_keys(spark):
    """Params and input schema must both key the cache."""
    a = _packed(spark)
    fp = plancache._fingerprint
    assert fp("n", (("templateid", "T"),), a.schema.json()) != fp(
        "n", (("templateid", "U"),), a.schema.json()
    )
    other = a.withColumn("extra", F.lit(1))
    assert fp("n", (), a.schema.json()) != fp("n", (), other.schema.json())


def test_schema_mismatch_is_a_miss(spark, cache_dir):
    """A blob written for one input schema must not be spliced onto a
    different one — the fingerprint diverges and the build runs live."""
    build = case_laws_document.__wrapped__
    plancache.cached_transform(
        "t_case_laws", (), _packed(spark), lambda d: build(d),
        cache_dir=cache_dir,
    )
    widened = _packed(spark).withColumn("stray", F.lit("x"))
    out = plancache.cached_transform(
        "t_case_laws", (), widened, lambda d: build(d), cache_dir=cache_dir
    )
    assert len(os.listdir(cache_dir)) == 2  # second schema wrote its own
    assert _rows(out) == _rows(build(widened))


def test_disable_env_bypasses_cache(spark, cache_dir, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_PLAN_CACHE", "0")
    build = case_laws_document.__wrapped__
    out = plancache.cached_transform(
        "t_case_laws", (), _packed(spark), lambda d: build(d),
        cache_dir=cache_dir,
    )
    assert not os.path.exists(cache_dir) or not os.listdir(cache_dir)
    assert _rows(out) == _rows(build(_packed(spark)))


def test_decorator_routes_and_preserves_wrapped(spark):
    """The committed decorators key on kwargs; __wrapped__ exposes the
    undecorated composer for live-vs-cached comparisons."""
    assert hasattr(case_laws_document, "__wrapped__")
    out = case_laws_document(_packed(spark), templateid="T")
    live = case_laws_document.__wrapped__(_packed(spark), templateid="T")
    assert out.schema == live.schema
    assert _rows(out) == _rows(live)


def test_pyspark_upgrade_drill(spark, tmp_path, monkeypatch):
    """Upgrade drill (the round-3 watch item): a pyspark version change
    turns every blob into a miss — the miss path MUST rebuild live
    (identical rows) and rewrite a blob under the new fingerprint, after
    which hits resume. Keeps the private-API splice honest across
    upgrades; tools/gen_plan_cache.py is the bulk form of the same
    regeneration."""
    import pyspark

    cache_dir = str(tmp_path / "pc")
    calls = []

    def build(df):
        calls.append(1)
        return df.withColumn("y", F.col("x") + 1)

    df = spark.range(5).select(F.col("id").alias("x"))
    want = [(r["x"], r["y"]) for r in build(df).collect()]
    calls.clear()

    # populate + warm hit under the real version
    a = plancache.cached_transform("drill", (), df, build, cache_dir=cache_dir)
    assert [(r["x"], r["y"]) for r in a.collect()] == want
    assert len(calls) == 1
    blobs_v1 = set(os.listdir(cache_dir))
    assert blobs_v1
    b = plancache.cached_transform("drill", (), df, build, cache_dir=cache_dir)
    assert [(r["x"], r["y"]) for r in b.collect()] == want
    assert len(calls) == 1, "warm hit rebuilt live"

    # simulate the upgrade: the fingerprint covers pyspark.__version__
    try:
        monkeypatch.setattr(pyspark, "__version__", "999.0.0")
        plancache._source_digest.cache_clear()
        c = plancache.cached_transform(
            "drill", (), df, build, cache_dir=cache_dir
        )
        assert len(calls) == 2, "stale blob served across a version change"
        assert [(r["x"], r["y"]) for r in c.collect()] == want
        # the miss rewrote a blob under the new fingerprint…
        assert set(os.listdir(cache_dir)) - blobs_v1
        # …so the next call is a hit again
        d = plancache.cached_transform(
            "drill", (), df, build, cache_dir=cache_dir
        )
        assert len(calls) == 2
        assert [(r["x"], r["y"]) for r in d.collect()] == want
    finally:
        monkeypatch.undo()
        plancache._source_digest.cache_clear()
