"""M0 gate: byte-identical extraction + tokenizer golden vectors."""

from __future__ import annotations

from pyspark.sql import functions as F

from solr_indexing_spark.textprep import (
    extract_text,
    extract_text_str,
    tokenize,
    tokenize_stop_str,
    tokenize_str,
)


def test_extract_text_basic():
    html = b"<html><body><p>Hello <b>world</b></p></body></html>"
    assert extract_text_str(html) == "Hello world"


def test_extract_text_strips_reference_constructs():
    # the shapes the reference strips: solrIndexCreation.ts:776-804,2776-2822
    html = (
        b"<html><head><title>t</title></head><body>"
        b"<header>nav stuff</header>"
        b'<div class="footprint">tracker</div>'
        b"<p>keep this</p>"
        b"<footnote>drop this</footnote>"
        b"<p>and this</p></body></html>"
    )
    assert extract_text_str(html) == "keep this and this"


def test_extract_text_entities_and_whitespace():
    html = b"<p>a&amp;b   c&#39;d\n\te</p>"
    assert extract_text_str(html) == "a&b c'd e"


def test_extract_text_nested_skip():
    html = b'<div class="footprint"><p>inner <b>deep</b></p></div><p>ok</p>'
    assert extract_text_str(html) == "ok"


def test_extract_text_none_and_empty():
    assert extract_text_str(None) == ""
    assert extract_text_str(b"") == ""


def test_tokenizer_golden():
    assert tokenize_str("Hello, World-42 foo_bar") == ["hello", "world", "42", "foo", "bar"]
    assert tokenize_str("Café ÜBER 東京 straße") == ["café", "über", "東京", "straße"]
    assert tokenize_str("don't") == ["don", "t"]
    assert tokenize_str("") == []
    assert tokenize_str(None) == []
    assert tokenize_str("  \n\t ") == []
    assert tokenize_str("a1b2 3c") == ["a1b2", "3c"]


def test_tokenizer_stopwords():
    assert tokenize_stop_str("the quick fox is fast") == ["quick", "fox", "fast"]


def test_byte_identity_corpus(pages_pdf):
    """Per-row invariant (BASELINE.json input_hint): extract(html) == text."""
    for _, row in pages_pdf.iterrows():
        assert extract_text_str(row.html) == row.text


def test_udf_matches_pure_python(spark, pages_df):
    out = (
        pages_df.withColumn("ext", extract_text(F.col("html")))
        .withColumn("toks", tokenize(F.col("text")))
        .select("url", "text", "ext", "toks")
        .collect()
    )
    assert len(out) == 500
    for r in out:
        assert r["ext"] == r["text"]
        assert r["toks"] == tokenize_str(r["text"])


def test_gen_pages_stopword_frac():
    """stopword_frac=0 must stay byte-identical to the historical corpus
    (golden anchors depend on the (n, seed) stream); frac>0 interleaves
    ~that fraction of STOPWORDS tokens, html staying in sync with text."""
    from solr_indexing_spark.synth import gen_pages
    from solr_indexing_spark.textprep import STOPWORDS

    base = gen_pages(200, seed=7)
    again = gen_pages(200, seed=7, stopword_frac=0.0)
    assert (base["text"] == again["text"]).all()
    assert list(base["html"]) == list(again["html"])

    mixed = gen_pages(200, seed=7, stopword_frac=0.4)
    toks = " ".join(mixed["text"]).split()
    frac = sum(t in STOPWORDS for t in toks) / len(toks)
    assert 0.35 < frac < 0.45, frac
    # content tokens keep their order: stripping stopwords recovers base
    for b, m in zip(base["text"], mixed["text"]):
        kept = " ".join(t for t in m.split() if t not in STOPWORDS)
        assert kept == b
    # html rendered from the mixed text (extraction invariant holds)
    assert extract_text_str(mixed["html"].iloc[0]) == mixed["text"].iloc[0]
