"""masterinfo facets, iltinfo tree, associate grammars, AuthorName
(solrIndexCreation.ts:1414-1594, 1953-2178, 2333-2583, 5234-5262)."""

from __future__ import annotations

from pyspark.sql import functions as F

from solr_indexing_spark.docprep.masterinfo import (
    ilt_suggest_inputs,
    parse_aaa_association,
    parse_arinfo_caselaw,
    parse_authors,
    parse_bench,
    parse_benchtype,
    parse_casereferred,
    parse_cirnot_assoc,
    parse_court,
    parse_gst_subjects,
    parse_iltinfo,
    parse_infavourof,
    parse_serviceinfo,
    parse_slpinfo,
    search_ilt_citation,
)


def _one(spark, col, value):
    df = spark.createDataFrame([(value,)], "v string")
    return df.select(col.alias("out")).collect()[0]["out"]


def test_parse_court(spark):
    got = _one(
        spark, parse_court(F.col("v")),
        "111270000000000009^SC^Supreme Court^1",
    )
    assert len(got) == 1
    c = got[0]
    assert c["id"] == "111270000000000009"
    assert c["shortName"] == "SC" and c["name"] == "Supreme Court"
    assert c["ordering"] == "1" and c["type"] == "court"
    assert c["url"] == "supreme-court"
    assert _one(spark, parse_court(F.col("v")), "loneid") == []
    assert _one(spark, parse_court(F.col("v")), None) == []


def test_parse_bench_and_benchtype(spark):
    got = _one(spark, parse_bench(F.col("v")), "42^DB^Division Bench")
    assert got[0]["name"] == "Division Bench" and got[0]["ordering"] == ""
    # benchtype requires an id longer than 12 chars (ts:2075)
    assert _one(spark, parse_benchtype(F.col("v")), "42^DB^Division") == []
    got = _one(
        spark, parse_benchtype(F.col("v")), "111270000000000001^LB^Large"
    )
    assert got[0]["type"] == "benchtype" and got[0]["name"] == "Large"


def test_parse_infavourof_and_service(spark):
    got = _one(
        spark, parse_infavourof(F.col("v")), "1^Assessee|2^Revenue"
    )
    assert [(g["id"], g["name"]) for g in got] == [
        ("1", "Assessee"), ("2", "Revenue")
    ]
    assert all(g["shortName"] == "" for g in got)
    got = _one(
        spark, parse_serviceinfo(F.col("v")), "9|x|Advisory Service|3"
    )
    assert got[0]["id"] == "9" and got[0]["name"] == "Advisory Service"
    assert got[0]["orderInteger"] == 3
    assert got[0]["ordering"] == "advisory service"


def test_parse_gst_subjects(spark):
    df = spark.createDataFrame(
        [(
            "111060000000000001^Levy|111070000000000002^Scope"
            "$111060000000000001^Levy|111070000000000003^Rates",
            "x,111050000000016981,y",
        )],
        "g string, cats string",
    )
    got = df.select(
        parse_gst_subjects(F.col("g"), F.col("cats")).alias("o")
    ).collect()[0]["o"]
    # first-wins dedup: the duplicate Levy classification appears once
    assert [c["name"] for c in got["classification"]] == ["Levy"]
    assert [s["name"] for s in got["subclassification"]] == ["Scope", "Rates"]
    assert got["subclassification"][0]["type"] == "subclassification"


def test_parse_gst_subjects_special_branch(spark):
    # sub field short (<10), main field long (>10), GST category present →
    # synthetic "Classification of Subject" parent; field0 becomes the sub
    df = spark.createDataFrame(
        [("111060000000000001^Levy|x", "111050000000016981")],
        "g string, cats string",
    )
    # needs a '$' to enter the parse at all (ts:1954)
    df = df.withColumn("g", F.concat(F.col("g"), F.lit("$")))
    got = df.select(
        parse_gst_subjects(F.col("g"), F.col("cats")).alias("o")
    ).collect()[0]["o"]
    assert [c["name"] for c in got["classification"]] == [
        "Classification of Subject"
    ]
    assert got["classification"][0]["id"] == "000000000000000000"
    assert [s["name"] for s in got["subclassification"]] == ["Levy"]


def test_parse_aaa_association(spark):
    v = (
        "200|Account Standard^AS 1: Disclosure#3~2021"
        "$201|Ind AS^Ind AS 101: First-time#7~2020"
        "$202|Other^X#1~2019"
    )
    got = _one(spark, parse_aaa_association(F.col("v")), v)
    a = got["accountingstandard"]
    assert len(a) == 1 and a[0]["id"] == "200"
    assert a[0]["name"] == "AS 1: Disclosure"
    assert a[0]["shortName"] == "AS 1"
    assert a[0]["orderInteger"] == 3
    i = got["indas"]
    assert len(i) == 1 and i[0]["type"] == "indas"
    assert i[0]["shortName"] == "Ind AS 101"


def test_parse_casereferred(spark):
    df = spark.createDataFrame(
        [("77|cited^CIT v. Alpha#01-02-2004@Sub Heading%SC"
          "$78|followed^CIT v. Beta#03-04-2005@Other%HC", "MID9")],
        "v string, mid string",
    )
    got = df.select(
        parse_casereferred(F.col("v"), F.col("mid")).alias("o")
    ).collect()[0]["o"]
    assert len(got) == 2
    g = got[0]
    assert g["id"] == "77" and g["type"] == "cited"
    assert g["name"] == "CIT v. Alpha"
    assert g["date"] == "20040201"
    assert g["subheading"] == "Sub Heading"
    assert g["courtshortname"] == "SC"
    assert g["associatedDocid"] == "MID9"
    # single-element (no second '$' part) → reference requires length>1
    single = df.select(
        parse_casereferred(F.lit("77|cited^N#d@s%c"), F.col("mid")).alias("o")
    ).collect()[0]["o"]
    assert single == []


def test_parse_arinfo_caselaw(spark):
    v = (
        "10|affirmed^CIT v. Gamma#05-06-2006%ITAT@The Sub~900"
        "$11|reversed^CIT v. Delta#07-08-2007%HC@Other Sub~901"
    )
    got = _one(spark, parse_arinfo_caselaw(F.col("v")), v)
    assert len(got) == 2
    g = got[0]
    assert g["id"] == "10" and g["type"] == "affirmed"
    assert g["date"] == "20060605"
    assert g["courtshortname"] == "ITAT"
    assert g["subheading"] == "The Sub"
    assert g["associatedDocid"] == "900"


def test_parse_slpinfo(spark):
    v = "SLP Granted|Civil Appeal 1^55@800$SLP Dismissed|CA 2^56@801"
    got = _one(spark, parse_slpinfo(F.col("v")), v)
    assert len(got) == 2
    g = got[0]
    assert g["id"] == "55" and g["type"] == "SLP Granted"
    assert g["name"] == "SLP Granted"  # name==type quirk (ts:1549)
    assert g["subheading"] == "Civil Appeal 1"
    assert g["associatedDocid"] == "800"


def test_parse_cirnot_assoc(spark):
    v = "5|circular^Circ 12^20200101^About GST$6|notification^N 1^20200202^X"
    got = _one(spark, parse_cirnot_assoc(F.col("v")), v)
    assert len(got) == 2
    assert got[0]["id"] == "5" and got[0]["type"] == "circular"
    assert got[0]["name"] == "Circ 12" and got[0]["date"] == "20200101"
    assert got[0]["subheading"] == "About GST"


def test_parse_iltinfo_tree(spark):
    v = (
        "100^India#1|200^Mauritius#2|300^Article 13|400-9^Capital Gains"
        "|500^Shares"
    )
    got = _one(spark, parse_iltinfo(F.col("v")), v)
    assert len(got) == 1
    t = got[0]
    assert t["country1"]["id"] == "100" and t["country1"]["name"] == "India"
    assert t["country1"]["ordering"] == "1"
    assert t["country1"]["orderInteger"] == 1
    assert t["country2"]["pid"] == "100"
    assert t["country2"]["name"] == "Mauritius"
    assert t["article"]["pid"] == "100200"
    assert t["article"]["name"] == "Article 13"
    assert t["subject"]["id"] == "400" and t["subject"]["pSubId"] == "9"
    assert t["subject"]["pid"] == "100200"
    assert t["subject"]["ordering"] == "capital gains"
    assert t["subsubject"]["pid"] == "400"
    # searchiltcitation concat of the 5 ids
    cit = _one(
        spark, search_ilt_citation(parse_iltinfo(F.col("v"))), v
    )
    assert cit == ["100" + "200" + "300" + "400" + "500"]


def test_parse_iltinfo_short_fields_empty(spark):
    # fields of length ≤5 yield empty structs (ts:2364,2387,2407,2428)
    v = "100^India|x|y|z|w"
    t = _one(spark, parse_iltinfo(F.col("v")), v)[0]
    assert t["country2"]["id"] == "" and t["article"]["name"] == ""
    assert t["subject"]["id"] == "" and t["subsubject"]["name"] == ""
    # '$'-list form: two trees
    got = _one(spark, parse_iltinfo(F.col("v")), v + "$" + v)
    assert len(got) == 2
    assert _one(spark, parse_iltinfo(F.col("v")), None) == []


def test_ilt_suggest_inputs(spark):
    v = "100^India|200^Mauritius|300^Article 13|400^Capital Gains|500^Shares"
    got = _one(spark, ilt_suggest_inputs(parse_iltinfo(F.col("v"))), v)
    assert got["countries"] == ["india", "mauritius"]
    assert got["articles"] == ["article 13"]
    assert got["subjects"] == ["capital gains", "shares"]


def test_parse_authors(spark):
    v = (
        "A1@Jane Scholar~Senior Advocate^https://example.org/js#"
        "/img/js.png!4$A2@Ken Writer~Editor^#"
    )
    got = _one(spark, parse_authors(F.col("v")), v)
    assert len(got) == 2
    a = got[0]
    assert a["id"] == "A1" and a["name"] == "Jane Scholar"
    assert a["designation"] == "Senior Advocate"
    assert a["socialSiteUrl"] == "https://example.org/js"
    assert a["imagePath"] == "/img/js.png"
    assert a["orderInteger"] == 4
    b = got[1]
    assert b["name"] == "Ken Writer" and b["orderInteger"] == 0


def test_popular_acts_data_join(spark):
    """The shipped dim rows replay the reference's dictionary behavior:
    hits resolve to the reference id/name/urls; misses get the synthetic
    'Other Acts' row (common.ts:259-263; solrIndexCreation.ts:1137-1164)."""
    from solr_indexing_spark.docprep.enrich import popular_acts_join
    from solr_indexing_spark.docprep.popular_acts_data import (
        VARIANTS,
        other_act_cat_urls,
        popular_acts_df,
    )

    assert len(VARIANTS["case_final"][0]) == 138
    assert len(VARIANTS["case"][0]) == 81
    assert len(VARIANTS["cirnot"][0]) == 50
    assert len(VARIANTS["article"][0]) == 8

    dim = popular_acts_df(spark, "case_final")
    facts = spark.createDataFrame(
        [("102010000000000152",), ("000000000000000001",)], "act_id string"
    )
    got = {
        r["act_id"]: r
        for r in popular_acts_join(facts, dim).collect()
    }
    hit = got["102010000000000152"]
    assert hit["resolved_act_name"] == "Customs Act, 1962"
    assert hit["act_cat_urls"] == ["centax-customs", "centax-excise-service-tax"]
    assert hit["is_popular_act"]
    miss = got["000000000000000001"]
    assert miss["resolved_act_id"] == "999999999999999999"
    assert miss["resolved_act_name"] == "Other Acts"
    assert not miss["is_popular_act"]
    assert other_act_cat_urls("case_final") == ["goods-services-tax"]


# --- round-2 per-doctype ilt / AAA variants --------------------------------


def test_parse_iltinfo_cirnot_branches(spark):
    from solr_indexing_spark.docprep.masterinfo import parse_iltinfo_cirnot

    col = parse_iltinfo_cirnot(F.col("v"))
    # '$'-list branch: short fields zero-fill with pids
    out = _one(
        spark, col, "100^India|short$100^India|200^Mauritius|300^Article 9|x|y"
    )
    t0, t1 = out["trees"]
    assert t0["country1"]["name"] == "India"
    assert t0["country2"]["id"] == "0" * 18
    assert t0["country2"]["pid"] == "100"
    assert t0["article"]["pid"] == "100" + "0" * 18
    assert t1["country2"]["name"] == "Mauritius"
    assert t1["article"]["name"] == "Article 9"
    assert out["names"][0] == "100" + ("0" * 18) * 4
    # non-'$' branch: '' defaults, no pid on article
    out = _one(spark, col, "100^India|200^Mauritius|300^Article 9|x|y")
    t = out["trees"][0]
    assert t["article"]["pid"] == "" and t["subject"]["id"] == ""
    assert out["names"] == ["100200300"]
    # null → '$' branch with no entries (JS undefined?.indexOf quirk)
    out = _one(spark, col, None)
    assert out["trees"] == [] and out["names"] == []


def test_parse_iltinfo_article_branches(spark):
    from solr_indexing_spark.docprep.masterinfo import parse_iltinfo_article

    col = parse_iltinfo_article(F.col("v"))
    # '$' branch keeps '#'-ordering on countries and '-pSubId' on subject
    out = _one(
        spark, col,
        "100^India#1|200^Mauritius#2|300^Article 9#5|400-9^Long Subject X|y"
        "$101^France|short|x|y|z",
    )
    t0, t1 = out["trees"]
    assert t0["country1"]["ordering"] == "1"
    assert t0["country1"]["orderInteger"] == 1
    assert t0["article"]["ordering"] == "5"
    assert t0["subject"]["id"] == "400" and t0["subject"]["pSubId"] == "9"
    assert t0["subject"]["pid"] == "100200"
    assert t1["country2"]["id"] == "0" * 18
    # '' input → NO trees (unlike CirNot's one empty tree)
    out = _one(spark, col, "")
    assert out["trees"] == []


def test_parse_aaa_standards_article_vs_commentary(spark):
    from solr_indexing_spark.docprep.masterinfo import (
        parse_aaa_standards,
        parse_aaa_standards_commentary,
    )

    raw = (
        "S1|One^A@G1~Group A#3:2020"
        "$S2|Two^B@G1~Group A#4:2021"
        "$S3|Three^C@G2~Group B#5:2022"
    )
    art = _one(spark, parse_aaa_standards(F.col("v")), raw)
    # article variant: one standard per element (no dedup), year parsed
    assert [s["id"] for s in art["standards"]] == ["G1", "G1", "G2"]
    assert art["substandards"][0]["orderInteger"] == 3
    assert art["substandards"][0]["year"] == "2020"
    assert art["substandards"][0]["name"] == "One-A"
    com = _one(spark, parse_aaa_standards_commentary(F.col("v")), raw)
    # commentary variant: standards dedup first-wins; no '#' parsing
    assert [s["id"] for s in com["standards"]] == ["G1", "G2"]
    assert com["standards"][0]["name"] == "Group A#3:2020"
    assert com["substandards"][0]["orderInteger"] == 0
    assert len(com["substandards"]) == 3


def test_parse_iltinfo_treaty_empty_structs(spark):
    from solr_indexing_spark.docprep.masterinfo import parse_iltinfo_treaty

    col = parse_iltinfo_treaty(F.col("v"), F.lit("in|mu"), F.lit("2019"))
    out = _one(spark, col, "100^India|000000000000000000^X|short|x|y")
    t = out["trees"][0]
    # country2 with the 18-zero sentinel id is SKIPPED (fully empty struct)
    assert t["country2"]["id"] == "" and t["country2"]["type"] == ""
    assert t["flag1"]["name"] == "IN"
    # names zero-fill skipped parts and append the year
    assert out["names"] == ["100" + ("0" * 18) * 4 + "2019"]
