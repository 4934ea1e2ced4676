"""Text-analysis operators: Catalyst tokenizer parity, langid, quality,
fingerprints."""

from __future__ import annotations

from pyspark.sql import functions as F

from solr_indexing_spark.docprep.analysis import (
    bpe_ish_token_count,
    doc_fingerprint,
    lang_id,
    quality_metrics,
    quality_score,
    rolling_fingerprints,
    sql_tokens,
    token_count,
    whitespace_token_count,
)
from solr_indexing_spark.textprep import tokenize_str


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_sql_tokens_matches_python_tokenizer(spark, pages_pdf):
    """The Catalyst (JVM regex) tokenizer must agree with the Python Arrow-UDF
    tokenizer the index uses — same counts and same tokens on the synthetic
    corpus (unicode words included)."""
    sample = pages_pdf.head(80)
    df = _df(spark, list(sample["text"]))
    got = {
        r["doc_id"]: r["toks"]
        for r in df.select("doc_id", sql_tokens("text").alias("toks")).collect()
    }
    for i, text in enumerate(sample["text"]):
        assert got[i] == tokenize_str(text), f"doc {i} tokenizer divergence"


def test_token_counts(spark):
    df = _df(spark, ["Hello, world! x9 it's a_b", "", "   ", "one"])
    rows = df.select(
        token_count("text").alias("tc"),
        whitespace_token_count("text").alias("wc"),
        bpe_ish_token_count("text").alias("bc"),
    ).collect()
    # "Hello, world! x9 it's a_b" → [hello, world, x9, it, s, a, b]
    assert rows[0]["tc"] == 7
    assert rows[0]["wc"] == 5
    # bpe-ish: hello , world ! x 9 it ' s a _ b  → letters/digit-runs/symbols
    assert rows[0]["bc"] == 12
    assert [r["tc"] for r in rows[1:]] == [0, 0, 1]
    assert [r["wc"] for r in rows[1:]] == [0, 0, 1]


def test_lang_id(spark):
    df = _df(
        spark,
        [
            "the cat sat on the mat and it was happy",
            "der hund und die katze sind nicht im haus",
            "el perro y la casa de los niños es grande",
            "le chien est dans la maison et il ne dort pas",
            "zzz qqq www",  # no markers
        ],
    )
    got = [r[0] for r in df.select(lang_id("text")).collect()]
    assert got == ["en", "de", "es", "fr", "und"]


def test_quality_score_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and then it runs to " \
           "the river where it drinks some water before the long sleep at night"
    bad = "!!! ### $$$ %%% ^^^ &&& *** ((( )))"
    repeats = "spam " * 40
    df = _df(spark, [good, bad, repeats])
    rows = df.select(quality_score("text").alias("q")).collect()
    q_good, q_bad, q_rep = (r["q"] for r in rows)
    assert q_good > q_rep > q_bad
    assert 0.0 <= q_bad and q_good <= 1.0


def test_quality_metrics_values(spark):
    df = _df(spark, ["The cat, the cat! 42"])
    m = df.select(*quality_metrics("text")).collect()[0]
    # tokens: the cat the cat 42
    assert m["n_tokens"] == 5
    assert m["digit_ratio"] == round(2 / len("The cat, the cat! 42"), 4)
    assert m["stopword_ratio"] == round(2 / 5, 4)
    assert m["uniq_token_ratio"] == round(3 / 5, 4)


def test_fingerprint_normalization_invariance(spark):
    df = _df(spark, ["Hello,   WORLD!", "hello world", "hello worlds"])
    fps = [r[0] for r in df.select(doc_fingerprint("text")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
    assert all(0 <= f < (1 << 60) for f in fps)


def test_rolling_fingerprints(spark):
    base = " ".join(f"w{i}" for i in range(40))
    prefixed = "intro words here " + base
    df = _df(spark, [base, prefixed])
    rows = df.select(rolling_fingerprints("text").alias("rf")).collect()
    a, b = set(rows[0]["rf"]), set(rows[1]["rf"])
    # shared content ⇒ overlapping sketches (winnowing property)
    assert len(a) == 4 and len(b) == 4
    assert a & b, "sketches of overlapping docs must intersect"
