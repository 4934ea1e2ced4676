"""Golden-document tests: the composed per-doctype pipelines produce the
full nested IndexDocument (solrIndexCreation.ts:890-2955 CaseLaws,
:27-888 ActRule; result.json pattern at :2921-2929). Expectations are
hand-derived from the reference row-loop semantics."""

from __future__ import annotations

import datetime

import pytest

from solr_indexing_spark.docprep.pipelines import (
    act_rule_document,
    case_laws_document,
    parse_act_associations,
)
from pyspark.sql import functions as F


CASE_ROW = {
    "mid": " SOLR-1 ",
    "id": "MID-77",
    "excusdocid": "EX-1",
    "documenttype": "Case Laws",
    "documentformat": ".XML",
    "url": "HTTPS://Example.org/Doc.xml",
    "year": "2004",
    "CaseSubject": "31|subject^Capital Gains~2$32|subject^Exemptions~5",
    "categoriescentax": "111050000000018392^Centax Customs%1$999^Other Cat",
    "groups": "G1^|Income Tax^Case Laws Group",
    "actassociations": (
        "102010000000000152|act^Customs Act, 1962~3"
        "$000000000000000001|act^Unknown Act~9"
        "$102010000000000152#S88|section^88 Refunds~4"
    ),
    "parentsectioninfo": "S88 stuff#P9|Parent Sec^Name~7",
    "casereferred": "77|cited^CIT v. Alpha#01-02-2004@SubH%SC$78|followed^B#03-04-2005@O%HC",
    "arinfo": "10|affirmed^CIT v. Gamma#05-06-2006%ITAT@TheSub~900$11|reversed^D#07-08-2007%HC@S2~901",
    "slpinfo": "SLP Granted|CA 1^55@800$SLP Dismissed|CA 2^56@801",
    "DDA_CirNot": "5|circular^Circ 12^20200101^About$6|notification^N1^20200202^X",
    "MasterCitationOrder": "2004|102030000000000001^ITR|12|345",
    "MasterCitationOrderCentax": "2004|9^J|12|345",
    "MasterCitationOrderCentaxElt": "1999|7^ELT|42|7",
    "MasterCitationOrderCentaxGstl": None,
    "MasterCitationOrderCentaxStr": "",
    "GSTSubjectID": "111060000000000001^Levy|111070000000000002^Scope$",
    "court": "111270000000000009^SC^Supreme Court of India^1",
    "bench": "42^DB^Division Bench",
    "benchtype": "111270000000000001^LB^Larger Bench",
    "InfavourofText": "1^Assessee",
    "ServiceInfo": "9|x|Advisory Service|3",
    "AAAAssociation": "200|Account Standard^AS 1: Disclosure#3~2021",
    "citation": "2004|11^ITR|5|100$2005|22^ELT|6|200",
    "fullcitation": "[2004] 1 ITR 500",
    "iltassociation": "100^India#1|200^Mauritius#2|300^Article 13|400-9^Capital Gains|500^Shares",
    "TagInfo": "T1^Alpha|T2^Beta$0^0|T3^Gamma",
    "MarkingInfo": None,
    "hn1": "First headnote",
    "hn2": "Second headnote",
    "hn3": None, "hn4": None, "hn5": None, "hn6": None, "hn7": None,
    "hn8": None, "hn9": None, "hn10": None,
    "HeadingSubheading": "Top Head|Sub Head$|",
    "partyname1": "Alpha Ltd",
    "partyname2": "Commissioner",
    "appealno": "CA 123/2004",
    "counselnameappellant": "Jane Advocate 102010000000000152",
    "counselnamerespondent": "Ken Counsel",
    "judgename": "J. Example",
    "documentdate": "20040201^01-02-2004",
    "CrossTagging": "w1 w2  w3",
    "Heading": "Alpha Ltd v. Commissioner",
    "subheading": "Customs valuation",
    "sortheading": "Alpha LTD",
    "sortbycourt": "SC",
    "sortbyname": "Alpha",
    "sortbyauthor": "",
    "searchheadingnumber": "No. 42!",
    "shortcontent": " Short text ",
    "fullcontent": "<document><p>Body</p><footnote>fn1</footnote></document>",
    "created_date": "20040202120000",
    "UpdatedDate": "20040203",
}


@pytest.fixture(scope="module")
def case_doc(spark):
    df = spark.createDataFrame(
        [tuple(CASE_ROW.values())],
        ", ".join(f"`{k}` string" for k in CASE_ROW),
    )
    return case_laws_document(df, templateid="T7").collect()[0]


def test_case_identity_and_flags(case_doc):
    d = case_doc
    assert d["id"] == "SOLR-1" and d["mid"] == "MID-77"
    assert d["excusdocid"] == "EX-1" and d["templateid"] == "T7"
    assert d["documenttype"] == "case laws"
    assert d["documentformat"] == ".xml"
    assert d["filenamepath"] == "HTTPS://Example.org/Doc.xml"
    assert d["url"] == "https://example.org/doc.xml"
    assert d["year"]["id"] == "2004" and d["year"]["name"] == "2004"
    assert d["ispublished"] is True and d["isshowonsite"] is True
    assert d["boostpopularity"] == 1000
    assert d["language"] == ""


def test_case_categories_final_filter(case_doc):
    # whitelist keeps 18392; final filter keeps it and strips 'Centax '
    cats = case_doc["categories"]
    assert len(cats) == 1
    assert cats[0]["id"] == "111050000000018392"
    assert cats[0]["name"] == "Customs"


def test_case_groups(case_doc):
    g = case_doc["groups"]
    # first '|' replaced by space → split('^') → ["G1", " Income Tax",
    # "Case Laws Group"]; name = element 1 trimmed (ts:1606-1608)
    assert g["id"] == "G1"
    assert g["name"] == "Income Tax"


def test_case_sort_keys(case_doc):
    d = case_doc
    assert d["sortbycitation"] == "2004" + "102030000000000001" + "0012" + "0000345"
    assert d["sortbycitationcentax"] == "20049" + "????" + "???????"
    assert d["sortbycitationcentaxelt"] == "19997" + "0042" + "0000007"
    assert d["sortbycitationcentaxgstl"] == "0000" + "0" * 18 + "0000" + "00000000"
    assert d["sortbycitationcentaxstr"] == "0000" + "0" * 18 + "0000" + "00000000"
    # last citation elected (ts:2297-2300)
    assert d["sortheadingnumber"] == "2005" + "22" + "0006" + "0000200"
    assert d["searchheadingnumber"] == "no 42 "


def test_case_masterinfo(case_doc):
    info = case_doc["masterinfo"]["info"]
    assert [s["name"] for s in info["subject"]] == ["Capital Gains", "Exemptions"]
    assert info["subject"][0]["ordering"] == "2"
    assert info["court"][0]["shortName"] == "SC"
    assert info["bench"][0]["name"] == "Division Bench"
    assert info["benchtype"][0]["name"] == "Larger Bench"
    assert info["infavourof"][0]["name"] == "Assessee"
    assert info["services"][0]["orderInteger"] == 3
    assert info["accountingstandard"][0]["shortName"] == "AS 1"
    assert [c["name"] for c in info["classification"]] == ["Levy"]
    assert [s["name"] for s in info["subclassification"]] == ["Scope"]
    # acts: popular hit keeps id+name; miss becomes Other Acts
    acts = info["act"]
    assert [(a["id"], a["name"]) for a in acts] == [
        ("102010000000000152", "Customs Act, 1962"),
        ("999999999999999999", "Other Acts"),
    ]
    assert acts[0]["catUrls"] == ["centax-customs", "centax-excise-service-tax"]
    assert acts[1]["catUrls"] == ["goods-services-tax"]
    # sections: popular act parent → filled struct with Section- prefix
    secs = info["section"]
    assert len(secs) == 1
    assert secs[0]["name"] == "Section - 88 Refunds"
    assert secs[0]["pid"] == "102010000000000152"
    assert secs[0]["actsectionid"] == "102010000000000152S88"
    # citations array round-trips
    cits = case_doc["masterinfo"]["citations"]
    assert len(cits) == 2 and cits[0]["journal"]["name"] == "ITR"
    # iltinfo tree
    ilt = case_doc["masterinfo"]["iltinfoes"]
    assert ilt[0]["country1"]["name"] == "India"
    assert ilt[0]["subject"]["pSubId"] == "9"


def test_case_associates(case_doc):
    a = case_doc["associates"]
    assert a["act"][0]["id"] == "102010000000000152"
    assert a["act"][1]["id"] == "000000000000000001"  # raw id on the assoc
    # parent-section override fires (parentsectioninfo contains S88)
    assert a["section"][0]["id"] == "P9"
    assert a["section"][0]["name"] == "Parent Sec-Name"
    assert a["section"][0]["ordering"] == "7"
    assert a["casereferred"][0]["date"] == "20040201"
    assert a["casereferred"][0]["associatedDocid"] == "MID-77"
    assert a["affirmreverse"][0]["courtshortname"] == "ITAT"
    assert a["slp"][0]["associatedDocid"] == "800"
    assert a["cirnot"][0]["name"] == "Circ 12"


def test_case_otherinfo_and_search_structs(case_doc):
    o = case_doc["otherinfo"]
    assert o["fullcitation"][0]["name"] == "[2004] 1 ITR 500 [01-02-2004]"
    assert len(o["similarfullcitation"]) == 4  # '500' has no A/J
    assert o["similarfullcitation"][1]["name"] == "2004 1 ITR 500"
    sc = case_doc["searchcitation"]["formattedcitation"]
    assert [s["name"] for s in sc] == [
        "2004" + "11" + "0005" + "0000100", "2005" + "22" + "0006" + "0000200"
    ]
    silt = case_doc["searchiltcitation"]["formattediltcitation"]
    assert [s["name"] for s in silt] == ["100200300400500"]


def test_case_tags_headnotes_content(case_doc):
    d = case_doc
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [
        ("T1", "Alpha"), ("T2", "Beta"), ("T3", "Gamma")
    ]  # the 0^0 placeholder excluded
    assert [(h["number"], h["text"]) for h in d["headnotes"]] == [
        (1, "First headnote"), (2, "Second headnote")
    ]
    assert d["headnotestext"].startswith("First headnote~~Second headnote~~ ")
    assert d["topstoryheading"] == "" and d["topstorydesc"] == ""
    assert d["wordphraseids"] == ["w1", "w2", "w3"]
    assert d["shortcontent"] == "Short text"
    # footnote extracted, metadata div injected before </document>
    assert d["footnotecontent"] == "<footnote>fn1</footnote>"
    assert "<footnote>" not in d["fullcontent"].replace(
        d["footnotecontent"], ""
    )
    assert "<div id='xmlmetadata' style='display:none;'>" in d["fullcontent"]
    assert d["fullcontent"].endswith("</document>")
    assert d["xmltag"] == ""


def test_case_boost_dates_heading(case_doc):
    d = case_doc
    assert d["documenttypeboost"] == 5000  # SC court id
    assert d["documentdate"] == "20040201"
    assert d["displaydocumentdatestring"] == "20040201"
    assert d["formatteddocumentdate"] == datetime.date(2004, 2, 1)
    assert d["created_date"] == datetime.datetime(2004, 2, 2, 12, 0, 0)
    assert d["updated_date"] == datetime.datetime(2004, 2, 3, 0, 0, 0)
    # heading carries the display-date suffix when dated (ts:1941)
    assert d["heading"] == "Alpha Ltd v. Commissioner[01-02-2004]"
    assert d["sortheading"] == "alpha ltd"


def test_case_suggest_and_sbt(case_doc):
    d = case_doc
    sug = [(tuple(s["Input"]), s["Weight"]) for s in d["Suggest"]]
    assert (("capital gains", "exemptions"), 18) in sug
    assert (("customs act, 1962",), 20) in sug
    assert (("other acts",), 20) in sug
    assert (("section - 88 refunds",), 1) in sug
    assert (("india", "mauritius"), 8) in sug
    assert (("article 13",), 1) in sug
    # classification + ilt subject pool at 16
    assert (("Levy".strip(), "capital gains", "shares"), 16) in sug or (
        ("Levy", "capital gains", "shares"), 16
    ) in sug
    assert (("top head", "sub head"), 16) in sug
    sbt = d["searchboosttext"]
    assert "customs act" in sbt and "alpha ltd" in sbt.lower()
    assert "appeal no" in sbt
    # 18-digit ids stripped from counsel names (StringOnly)
    assert "102010000000000152 " not in sbt.split("appeal no")[1].split("alpha")[0]


def test_act_rule_document(spark):
    row = {
        "mid": "A1", "id": "M1", "documenttype": "Rule",
        "documentformat": ".htm", "filenamepath": "f.htm",
        "url": "HTTP://X/rules.htm", "year": "2019",
        "groups": "G9^CGST Regulations|111050000000010567^CGST Rules",
        "Heading": "12 Refund procedure.",
        "subheading": "sub", "sortheading": "S", "sortheadingnumber": "12",
        "searchheadingnumber": "12",
        "parentheading": "P1^Chapter II#4|C1^Refunds$x",
        "ActRuleSubject": "31|subject^Refunds~1$x",
        "AAAAssociation": None,
        "TaggingInfo": "222210000000000002|TC1^Repealed Act",
        "AlliedInfo": "AL1|Allied Name",
        "categoriescentax": "111050000000018400^Centax GST%0",
        "masterinfo": "some 102010000000000337 master",
        "language": "EN", "shortcontent": "sc",
        "fullcontent": "<html><p>Body</p></html>",
        "documentdate": "20190701", "created_date": "20190702120000",
        "UpdatedDate": "20190703",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = act_rule_document(df, doc_type=2, templateid="T2").collect()[0]
    # Rule heading: regulations group → 'Regulation - ' prefix; trailing
    # dot stripped (ts:338-347)
    assert d["heading"] == "Regulation - 12 Refund procedure"
    # subgroup year suffix (ts:311-313)
    assert d["groups"]["group"]["subgroup"]["name"] == "CGST Rules, 2019"
    assert d["groups"]["group"]["name"] == "CGST Regulations"
    # 2-level parentheadings with RuleNo suffix (ts:371-398)
    p = d["parentheadings"][0]
    assert p["id"] == "P1" and p["name"] == "Chapter II"
    assert p["ordering"] == "4"
    assert p["subparentheading"]["id"] == "C1"
    assert p["subparentheading"]["name"] == "Refunds - RuleNo :12 Refund procedure."
    # repealed tag zeroes the boost (ts:821-825)
    assert d["documenttypeboost"] == 0
    # ruleno master synthesized from heading (ts:694-704)
    rn = d["masterinfo"]["info"]["ruleno"]
    assert rn[0]["name"] == "Regulation - 12 Refund procedure"
    assert rn[0]["type"] == "ruleno"
    # taginfo: TaggingInfo + AlliedInfo appended
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [
        ("TC1", "Repealed Act"), ("AL1", "Allied Name")
    ]
    # searchboosttext present (groups + named parent) and id-stripped
    assert d["searchboosttext"] != ""
    assert "102010000000000337" not in d["searchboosttext"]
    # metadata div before </html> for .htm content
    assert "<div id='htmmetadata' style='display:none;'>" in d["fullcontent"]
    assert d["Suggest"][0]["Input"] == ["cgst rules, 2019"]
    assert d["Suggest"][0]["Weight"] == 20


def test_act_rule_act_doctype_classification(spark):
    rows = [
        ("1", "M", "Act", "", "", "u", "2020",
         "G^Acts|S^Sub", "12 Levy of duty", "", "", "", "",
         "P1|Chap^ter#3", None, None, "x|t^n", None, None, None, "en",
         "", "", "20200101", "", ""),
    ]
    cols = ("mid id documenttype documentformat filenamepath url year groups "
            "Heading subheading sortheading sortheadingnumber "
            "searchheadingnumber parentheading ActRuleSubject AAAAssociation "
            "TaggingInfo AlliedInfo categoriescentax masterinfo language "
            "shortcontent fullcontent documentdate created_date UpdatedDate"
            ).split()
    df = spark.createDataFrame(rows, ", ".join(f"`{c}` string" for c in cols))
    d = act_rule_document(df, doc_type=1).collect()[0]
    assert d["heading"] == "Section - 12 Levy of duty"
    assert d["documenttypeboost"] == 10000
    # docType 1 single parentheading 'id|name^x#ord' (ts:357-368)
    assert d["parentheadings"][0]["id"] == "P1"
    assert d["parentheadings"][0]["name"] == "Chap ter"
    assert d["parentheadings"][0]["ordering"] == "3"


def test_parse_act_associations_empty(spark):
    df = spark.createDataFrame([(None, None)], "a string, p string")
    got = df.select(
        parse_act_associations(F.col("a"), F.col("p")).alias("o")
    ).collect()[0]["o"]
    assert got["acts"] == [] and got["sections"] == []
    assert got["actassociations"] == [] and got["sectionassociations"] == []
