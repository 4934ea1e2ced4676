"""Grammar parsers vs hand-derived expected values (FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from solr_indexing_spark.docprep import grammars as G
from solr_indexing_spark.docprep import enrich as E


def test_parse_categories_whitelist_and_shapes(spark):
    raw = "$".join(
        [
            # piped, whitelisted default branch: cat from seg0, subcat from seg1
            "111050000000018392^Centax Income Tax|111050000000018392^Centax Income Tax%1",
            # piped, NOT whitelisted → dropped
            "999^Other|999^Other%0",
            # no pipe → no whitelist check, empty subcategory
            "123^Plain Cat%1",
        ]
    )
    df = spark.createDataFrame([(raw,)], "categoriescentax string")
    out = df.select(G.parse_categories("categoriescentax").alias("cats")).collect()[0]["cats"]
    assert len(out) == 2
    first, second = out
    assert first["id"] == "111050000000018392"
    assert first["name"] == "Centax Income Tax"
    assert first["isprimarycat"] == 1
    assert first["url"] == "centax-income-tax"
    assert first["subcategory"]["id"] == "111050000000018392"
    assert second["id"] == "123"
    assert second["name"] == "Plain Cat"
    assert second["subcategory"]["id"] == ""


def test_parse_categories_special_ids(spark):
    # competition id → constant name regardless of packed name
    raw = "x^ignored|111050000000000006^whatever%0"
    df = spark.createDataFrame([(raw,)], "c string")
    out = df.select(G.parse_categories("c").alias("cats")).collect()[0]["cats"]
    # competition id is not in the required whitelist → dropped entirely
    assert out == []


def test_filter_final_categories(spark):
    raw = "$".join(
        [
            "111050000000018392^Centax Income Tax|111050000000018392^centax Sub%0",
            "111050000000018768^Centax GST|111050000000018768^Centax GST%0",
        ]
    )
    df = spark.createDataFrame([(raw,)], "c string")
    out = df.select(
        G.filter_final_categories(G.parse_categories("c")).alias("cats")
    ).collect()[0]["cats"]
    # 18768 not in the final 3-id list → dropped; 'centax ' stripped (ci)
    assert len(out) == 1
    assert out[0]["name"] == "Income Tax"


def test_parse_groups(spark):
    df = spark.createDataFrame(
        [("111050000000005001^Direct Tax Laws|extra",)], "g string"
    )
    out = df.select(G.parse_groups("g").alias("grp")).collect()[0]["grp"]
    assert out["id"] == "111050000000005001"
    assert out["name"] == "Direct Tax Laws extra"
    assert out["url"] == "direct-tax-laws-extra"


def test_parse_group_chain(spark):
    df = spark.createDataFrame(
        [("1^Top#10|2^Mid Level#20|3^Leaf#30",)], "g string"
    )
    out = df.select(G.parse_group_chain("g").alias("c")).collect()[0]["c"]
    assert [(x["id"], x["name"], x["ordering"]) for x in out] == [
        ("1", "Top", "10"), ("2", "Mid Level", "20"), ("3", "Leaf", "30"),
    ]
    assert out[1]["url"] == "mid-level"


def test_headnotes(spark):
    df = spark.createDataFrame(
        [("h1", None, "h3", "", None, None, None, None, None, "h10")],
        ", ".join(f"hn{i} string" for i in range(1, 11)),
    )
    cols = [f"hn{i}" for i in range(1, 11)]
    row = df.select(
        G.headnotes_array(*cols).alias("arr"),
        G.headnotes_text(*cols).alias("txt"),
    ).collect()[0]
    assert [(h["number"], h["text"]) for h in row["arr"]] == [
        (1, "h1"), (3, "h3"), (10, "h10"),
    ]
    # hn10 appends a space, not '~~' (reference quirk, ts:2713)
    assert row["txt"] == "h1~~h3~~h10 "


def test_marking_info_parser():
    raw = (
        "Top story text|img.png^Heading One##Desc body@@iignored~x\\"
        "20240101_rest@@eParentA@@tChild$"
        "Second|i2^H2##D2@@ii~y\\20240202_z"
    )
    out = G.parse_marking_info_str(raw)
    assert len(out) == 2
    m1, m2 = out
    assert m1["number"] == 1 and m1["image"] == "img.png"
    assert m1["text"] == "Top story text"
    assert m1["topstoryheading"] == "Heading One"
    assert m1["topstorydesc"] == "Desc body"
    assert m2["number"] == 2 and m2["topstoryheading"] is None
    assert G.parse_marking_info_str("") is None
    assert G.parse_marking_info_str("nopipes") == []


def test_marking_info_udf(spark):
    # grammar: …@@i<x>~<entrydate>\<updateddate>_<rest> (ts:2650-2652)
    df = spark.createDataFrame([("A|i^H##D@@ix~20240101\\20240202_extra",)], "m string")
    out = df.select(G.parse_marking_info(F.col("m")).alias("mi")).collect()[0]["mi"]
    assert out[0]["image"] == "i"
    assert out[0]["entrydate"] == "20240101"
    assert out[0]["updateddate"] == "20240202 extra"


def test_explode_digests(spark):
    df = spark.createDataFrame(
        [("case1", "D100$c1~n@tld1^content1|D200$c2~n@tld2^content2"),
         ("case2", None)],
        "mid string, DTDInfo string",
    )
    out = G.explode_digests(df).select("mid", "digest_id", "documenttype").collect()
    assert [(r["mid"], r["digest_id"]) for r in out] == [
        ("case1", "D100"), ("case1", "D200"),
    ]
    assert all(r["documenttype"] == "digest" for r in out)


def test_tokenize_crosstagging(spark):
    df = spark.createDataFrame([("a  b c ",)], "t string")
    out = df.select(G.tokenize_crosstagging("t").alias("w")).collect()[0]["w"]
    assert out == ["a", "b", "c"]


def test_popular_acts_join(spark):
    facts = spark.createDataFrame(
        [("1001", "doc1"), ("9999", "doc2")], "act_id string, doc string"
    )
    dim = spark.createDataFrame(
        [("1001", "Synthetic Act, 2001", ["cat-a", "cat-b"])],
        "act_id string, act_name string, cat_urls array<string>",
    )
    out = {r["doc"]: r for r in E.popular_acts_join(facts, dim).collect()}
    hit, miss = out["doc1"], out["doc2"]
    assert hit["is_popular_act"] and hit["resolved_act_name"] == "Synthetic Act, 2001"
    assert hit["resolved_act_id"] == "1001"
    assert hit["act_cat_urls"] == ["cat-a", "cat-b"]
    assert not miss["is_popular_act"]
    assert miss["resolved_act_id"] == E.OTHER_ACT_ID
    assert miss["resolved_act_name"] == "Other Acts"
    assert miss["resolved_act_url"] == "other-acts"


def test_suggest_assembly(spark):
    df = spark.createDataFrame([(["act one"], [])], "acts array<string>, secs array<string>")
    out = df.select(
        E.suggest_array(
            E.suggest_entry(F.col("acts"), "act"),
            E.suggest_entry(F.col("secs"), "section"),
        ).alias("s")
    ).collect()[0]["s"]
    assert len(out) == 1
    assert out[0]["Input"] == ["act one"] and out[0]["Weight"] == 20


def test_searchboosttext(spark):
    df = spark.createDataFrame(
        [("Party-A", "111050000000018392 vs B", "CA 123/2020")],
        "p1 string, p2 string, appeal string",
    )
    out = df.select(
        E.searchboosttext("p1", "p2", "appeal", literals={2: "appeal no"}).alias("t")
    ).collect()[0]["t"]
    assert out == "party a vs b appeal no ca 123 2020"


# --- J2 parent-section override + arinfo grammar (added later in round) ---


def test_parent_section_lookup(spark):
    from solr_indexing_spark.docprep.grammars import parent_section_lookup

    info = (
        "junk entry$#P100|Parent Name^x~5$#P200|Other^y~9"
    )
    df = spark.createDataFrame(
        [("A1", "P200", info), ("A1", "NOPE", info), ("A1", "", info)],
        "actid string, secid string, pinfo string",
    )
    rows = df.select(
        parent_section_lookup("actid", "secid", "pinfo").alias("o")
    ).collect()
    o = rows[0]["o"]
    assert o["id"] == "P200"
    assert o["name"] == "Other-y"  # first '^' → '-', then '~' split
    assert o["ordering"] == "9"
    assert o["actsectionid"] == "A1P200"
    assert rows[1]["o"] is None
    assert rows[2]["o"] is None  # empty secid never matches


def test_parent_section_last_match_wins(spark):
    from solr_indexing_spark.docprep.grammars import parent_section_lookup

    info = "#P1|First^a~1 S9$#P2|Second^b~2 S9"
    df = spark.createDataFrame([("A", "S9", info)], "actid string, secid string, pinfo string")
    o = df.select(parent_section_lookup("actid", "secid", "pinfo").alias("o")).collect()[0]["o"]
    assert o["id"].startswith("P2")


def test_parse_arinfo(spark):
    from solr_indexing_spark.docprep.grammars import parse_arinfo

    raw = (
        "123|affirmed^Case One Name##01-02-2019@@Sub Head~900$$"
        "456|reversed^Case Two##@@only-sub~901$$"
        "789justtype^No Pipe Here##02-03-2020@@x~902$$"
        "321|partial^NameOnly"
    )
    df = spark.createDataFrame([(raw,)], "arinfo string")
    arr = df.select(parse_arinfo("arinfo").alias("a")).collect()[0]["a"]
    # element 3 dropped (no '|' in first field); element 4 kept (no '##' →
    # empty name/date); order preserved
    assert len(arr) == 3
    a0 = arr[0]
    assert (a0["id"], a0["type"], a0["name"]) == ("123", "affirmed", "Case One Name")
    assert a0["date"] == "20190201"
    assert a0["subheading"] == "Sub Head"
    assert a0["associatedDocid"] == "900"
    assert a0["url"] == "case-one-name"
    a2 = arr[2]
    assert (a2["id"], a2["type"]) == ("321", "partial")
    assert a2["name"] == "" and a2["date"] == ""


def test_marking_parentmarking_comma_modes():
    """The three leading-comma treatments across reference loops:
    CaseLaws ts:2654 trims FIRST then strips exactly ONE comma;
    CirNot/Article ts:4513/5808 strip ALL commas then trim;
    Commentary/Book/News ts:7058/7601/8274 strip ALL commas, no trim."""
    raw = "T|i^H##D@@ix~20200101\\20200102_@@e,P1@@tP2"
    # joined parentmark = ",P1, P2"
    one = G.parse_marking_info_str(raw, comma_mode="one")
    assert one[0]["parentmarking"] == "p1, p2"
    all_trim = G.parse_marking_info_str(raw, comma_mode="all_trim")
    assert all_trim[0]["parentmarking"] == "p1, p2"
    # multi-comma input separates the modes
    raw2 = "T|i^H##D@@ix~20200101\\20200102_@@e,,P1@@tP2"
    one2 = G.parse_marking_info_str(raw2, comma_mode="one")
    assert one2[0]["parentmarking"] == ",p1, p2"  # ONE comma stripped
    at2 = G.parse_marking_info_str(raw2, comma_mode="all_trim")
    assert at2[0]["parentmarking"] == "p1, p2"  # ALL stripped, then trim
    # missing @@t tail: joined ends ", " — "all" keeps it (no trim)
    raw3 = "T|i^H##D@@ix~20200101\\20200102_@@eP1@@t"
    a3 = G.parse_marking_info_str(raw3, comma_mode="all")
    assert a3[0]["parentmarking"] == "p1, "
    t3 = G.parse_marking_info_str(raw3, comma_mode="all_trim")
    assert t3[0]["parentmarking"] == "p1,"
