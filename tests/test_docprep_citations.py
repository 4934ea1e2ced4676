"""Citation sort-key variants, citations[] parse, similarfullcitation
fan-out (solrIndexCreation.ts:1624-1942, 2182-2303, 5396-5487)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solr_indexing_spark.docprep.citations import (
    DEFAULT_SORT_KEY,
    citation_sort_key_variant,
    citation_sort_keys,
    full_citation_name,
    parse_citations,
    search_citation_names,
    similar_full_citations,
    sortheadingnumber_from_citations,
)


def _one(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col.alias("out")).collect()[0]["out"]


def test_sort_key_master(spark):
    key = _one(
        spark,
        citation_sort_key_variant(F.col("v"), "master"),
        "2004|102030000000000001^ITR|12|345",
    )
    assert key == "2004" + "102030000000000001" + "0012" + "0000345"


def test_sort_key_master_missing_fields(spark):
    # empty volume/page → ????/???????
    key = _one(
        spark,
        citation_sort_key_variant(F.col("v"), "master"),
        "2004|9^J||",
    )
    assert key == "20049" + "????" + "???????"
    # absent column → the else-branch default key (ts:1680-1685)
    assert _one(
        spark, citation_sort_key_variant(F.col("v"), "master"), None
    ) == DEFAULT_SORT_KEY
    assert DEFAULT_SORT_KEY == "0000" + "0" * 18 + "0000" + "00000000"


def test_sort_key_centax_inverted_quirk(spark):
    # the centax variant's inverted guard (ts:1722): non-empty volume →
    # "????", empty volume → "0000"; same inversion for page
    key = _one(
        spark,
        citation_sort_key_variant(F.col("v"), "centax"),
        "2004|9^J|12|345",
    )
    assert key == "20049" + "????" + "???????"
    key = _one(
        spark,
        citation_sort_key_variant(F.col("v"), "centax"),
        "2004|9^J||",
    )
    assert key == "20049" + "0000" + "0000000"


def test_sort_key_elt_trim_aware(spark):
    key = _one(
        spark,
        citation_sort_key_variant(F.col("v"), "elt"),
        "1999|7^ELT| 0042 |7",
    )
    assert key == "19997" + "0042" + "0000007"
    # whitespace-only volume → trim check fails → "????"
    key = _one(
        spark, citation_sort_key_variant(F.col("v"), "elt"), "1999|7^E|  |"
    )
    assert key == "19997" + "????" + "???????"


def test_sort_keys_all_variants(spark):
    df = spark.createDataFrame(
        [("2004|1^A|2|3", "2004|1^A|2|3", None, None, None)],
        "MasterCitationOrder string, MasterCitationOrderCentax string, "
        "MasterCitationOrderCentaxElt string, "
        "MasterCitationOrderCentaxGstl string, "
        "MasterCitationOrderCentaxStr string",
    )
    row = df.select(*citation_sort_keys().values()).collect()[0]
    assert row["sortbycitation"] == "20041" + "0002" + "0000003"
    assert row["sortbycitationcentax"] == "20041" + "????" + "???????"
    assert row["sortbycitationcentaxelt"] == DEFAULT_SORT_KEY
    assert row["sortbycitationcentaxgstl"] == DEFAULT_SORT_KEY
    assert row["sortbycitationcentaxstr"] == DEFAULT_SORT_KEY


def test_parse_citations_and_election(spark):
    v = "2004|11^ITR|5|100$2005|22^ELT|6|200"
    rows = _one(spark, parse_citations(F.col("v")), v)
    assert len(rows) == 2
    c0 = rows[0]
    assert c0["year"]["name"] == "2004" and c0["year"]["type"] == "year"
    assert c0["journal"]["id"] == "11" and c0["journal"]["name"] == "ITR"
    assert c0["journal"]["ordering"] == "itr"
    assert c0["volume"]["name"] == "0005"
    assert c0["pageno"]["name"] == "0000100"
    names = _one(spark, search_citation_names(F.col("v")), v)
    assert names == ["2004" + "11" + "0005" + "0000100",
                     "2005" + "22" + "0006" + "0000200"]
    # last search citation elected as sortheadingnumber (ts:2297-2300)
    shn = _one(spark, sortheadingnumber_from_citations(F.col("v")), v)
    assert shn == "2005" + "22" + "0006" + "0000200"
    assert _one(
        spark, sortheadingnumber_from_citations(F.col("v")), None
    ) == ""


def test_full_citation_name(spark):
    # first '|' → '/', leading '/' dropped (ts:5397-5407)
    assert _one(spark, full_citation_name(F.col("v")), "|2004| 1 ITR 5") == (
        "2004| 1 ITR 5"
    )
    assert _one(spark, full_citation_name(F.col("v")), "2004|1 ITR 5") == (
        "2004/1 ITR 5"
    )


def test_similar_full_citations_four(spark):
    got = _one(
        spark, similar_full_citations(F.col("v")), "[2004] 1 I.T.R. 500"
    )
    assert got == [
        "[2004] 1 I.T.R. 500",
        "2004 1 I.T.R. 500",
        "2004 1 ITR 500",
        " 2004  1 I T R  500",
    ]
    assert _one(spark, similar_full_citations(F.col("v")), None) == []
    assert _one(spark, similar_full_citations(F.col("v")), "  ") == []


def test_similar_full_citations_judge_suffix(spark):
    # last word contains A/J → 4 extra variants with A/a/J/j stripped from
    # the last word (ts:5446-5484)
    got = _one(
        spark, similar_full_citations(F.col("v")), "[2004] 5 SCC (Raj)"
    )
    assert len(got) == 8
    assert got[0] == "[2004] 5 SCC (Raj)"
    assert got[4] == "[2004] 5 SCC (R)"       # a and j stripped, case-insens
    assert got[5] == "2004 5 SCC R"
    # no A/J in the last word → only 4
    got = _one(spark, similar_full_citations(F.col("v")), "[2004] 5 ITR 100")
    assert len(got) == 4
