"""Golden vectors for the reference scalar library (FIXTURES.md §4)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from solr_indexing_spark.docprep import scalars as S


def _run(spark, col_fn, values, input_type="string"):
    df = spark.createDataFrame([(v,) for v in values], f"v {input_type}")
    return [r["out"] for r in df.select(col_fn(F.col("v")).alias("out")).collect()]


SLUG_CASES = [
    # (input, expected) — expected derived from common.ts:4-24 semantics:
    # first '-' removed, lowercase, strip $%#@!*?;:~`, spaces→'-',
    # collapse dashes, trim edge dashes
    ("Income Tax Act, 1961", "income-tax-act,-1961"),  # ',' NOT stripped (quirk)
    ("Foo-Bar-Baz", "foobar-baz"),  # only FIRST '-' removed
    ("  Hello World  ", "hello-world"),
    ("a$b%c#d@e!f*g?h;i:j~k`l", "abcdefghijkl"),
    ("a  b", "a-b"),
    ("-leading and trailing-", "leading-and-trailing-"),  # first '-' gone; trailing stripped... see note
    ("UPPER case", "upper-case"),
]


def test_slugify_golden(spark):
    # independently computed via the JS algorithm by hand:
    got = _run(spark, S.slugify, [c[0] for c in SLUG_CASES])
    # case 6: "-leading and trailing-" → first '-' removed →
    # "leading and trailing-" → spaces→- → "leading-and-trailing-" →
    # strip edge dashes → "leading-and-trailing"
    want = [
        "income-tax-act,-1961",
        "foobar-baz",
        "hello-world",
        "abcdefghijkl",
        "a-b",
        "leading-and-trailing",
        "upper-case",
    ]
    assert got == want


def test_remove_special_and_stringonly(spark):
    assert _run(spark, S.remove_special_with_space, ["a,b--c  d(e)"]) == ["a b c d e "]
    assert _run(spark, S.string_only, ["x 111050000000018392 y"]) == ["x   y"]
    assert _run(spark, S.string_only, ["no ids 123"]) == ["no ids 123"]


def test_ddmmyyyy(spark):
    assert _run(spark, S.ddmmyyyy_to_yyyymmdd, ["25-03-2019", "01-12-1999"]) == [
        "20190325", "19991201",
    ]


def test_parse_docdate(spark):
    got = _run(spark, S.parse_docdate, ["20190325", "20190325101530", "", "bad"])
    assert str(got[0]) == "2019-03-25 00:00:00"
    assert str(got[1]) == "2019-03-25 10:15:30"
    assert got[2] is None and got[3] is None


def test_default_docdate(spark):
    got = _run(spark, S.default_docdate, ["20190325^25 Mar 2019", "", None])
    assert got == ["20190325", "19000101", "19000101"]


def test_classify_heading(spark):
    fn = lambda c: S.classify_heading(c, "Section")
    assert _run(spark, fn, ["12AB Registration", "General provisions"]) == [
        "Section - 12AB Registration", "General provisions",
    ]


def test_strip_trailing_dot(spark):
    assert _run(spark, S.strip_trailing_dot, ["Rule 5.", "Rule 5.1"]) == [
        "Rule 5", "Rule 5.1",
    ]


def test_header_tag_functions(spark):
    html = "pre<header>m1</header>mid<HEADER>m2</HEADER>post"
    assert _run(spark, S.removed_header_tag, [html]) == ["premidpost"]
    # GetMetaTag is case-SENSITIVE (/gs, no /i) — quirk preserved
    assert _run(spark, S.get_meta_tag, [html]) == ["<header>m1</header>"]


def test_inject_metadata_div(spark):
    fn = lambda c: S.inject_metadata_div(c, F.lit("BOOST"), "xmlmetadata")
    div = "<div id='xmlmetadata' style='display:none;'>BOOST</div>"
    got = _run(spark, fn, ["<doc>x</doc></document>", "<body>y</body></html>", "plain"])
    assert got == [
        f"<doc>x</doc>{div}</document>",
        f"<body>y</body>{div}</html>",
        f"plain{div}",
    ]


def test_citation_sort_key(spark):
    got = _run(
        spark,
        S.citation_sort_key,
        [
            "2019|102030000000000111^ITR|45|234",
            "2019|102030000000000111^ITR||",
            None,
        ],
    )
    assert got == [
        "2019" + "102030000000000111" + "0045" + "0000234",
        "2019" + "102030000000000111" + "????" + "???????",
        "0000" + "0" * 18 + "0000" + "00000000",
    ]


def test_numeric_sort_guard(spark):
    got = _run(spark, S.numeric_sort_guard, ["123", "2147483647", "99999999999", "abc"])
    assert got == [123, None, None, None]


def test_court_boost(spark):
    got = _run(
        spark,
        S.court_boost,
        [
            "111270000000000009^Supreme Court of India^SC",
            "111270000000000044^High Court^HC",
            "111270000000000002^AAR^AAR",
            "111270000000000007^ITAT^ITAT",
            "somethingelse",
        ],
    )
    assert got == [5000, 4500, 4000, 3500, 3200]


def test_doc_type_boost_and_repeal(spark):
    df = spark.createDataFrame(
        [("act", "normal"), ("rule", "Repealed Act"), ("book", None)],
        "kind string, tags string",
    )
    got = df.select(
        S.repealed_boost_zero(F.col("tags"), S.doc_type_boost(F.col("kind"))).alias("b")
    ).collect()
    assert [r["b"] for r in got] == [10000, 0, 20]


def test_treaty_sort_prefix(spark):
    df = spark.createDataFrame(
        [("Comprehensive Agreements", "x"), ("Limited Agreements", "x"),
         ("Other Treaties", "x"), ("Misc", "x")],
        "g string, base string",
    )
    got = [r["p"] for r in df.select(S.treaty_sort_prefix("g", "base").alias("p")).collect()]
    assert got == ["10x", "20x", "30x", "40x"]
