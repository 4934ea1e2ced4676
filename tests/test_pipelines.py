"""Golden-document tests: the composed per-doctype pipelines produce the
full nested IndexDocument (solrIndexCreation.ts:890-2955 CaseLaws,
:27-888 ActRule; result.json pattern at :2921-2929). Expectations are
hand-derived from the reference row-loop semantics."""

from __future__ import annotations

import datetime

import pytest

from solr_indexing_spark.docprep.pipelines import (
    aaa_document,
    aaa_model_report_document,
    act_rule_document,
    article_document,
    case_finder_documents,
    case_laws_document,
    case_laws_partial_document,
    cirnot_document,
    commentary_book_document,
    commentary_document,
    form_document,
    news_document,
    parse_act_associations,
    treaty_document,
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


CIRNOT_ROW = {
    "mid": " C-1 ", "id": "MID-9", "excusdocid": "EX-2",
    "documenttype": "Circular", "documentformat": ".HTM",
    "url": "HTTP://X/c.htm",
    "year": "111050000000001234" + "2019",
    "categoriescentax": "111050000000018392^Centax Customs%1$999^Other Cat",
    "groups": "PFX|111050000000000113^Circular|SG1^GST Circulars",
    "Heading": "Circular No. 5/2019",
    "CirNotSubject": "31|subject^Levy~2$32|subject^Scope~5",
    "ActAssociation": (
        "102010000000000337|act^Income-tax Act, 1961~3"
        "$000000000000000001|act^Unknown Act~9"
        "$102010000000000337#S88|section^88 Refunds~4"
    ),
    "parentsectioninfo": None,
    "arinfo": "10|affirmed^CIT v. Gamma##05-06-2006@@TheSub~900",
    "DDA_Experts": "7|expert^John Doe^On GST$8|expert^Jane^On Customs",
    "subheading": " Sub ", "sortheading": "S", "sortheadingnumber": "N1",
    "searchheadingnumber": "No. 5!", "language": "EN",
    "masterinfo": "ST1|state^Delhi",
    "iltinfo": "100^India|200^Mauritius|300^Article 13|x|y",
    "MarkingInfo": None,
    "TagInfo": "T1^Alpha|T2^Beta",
    "documentdate": "20190301^01-03-2019",
    "shortcontent": " short ",
    "fullcontent": "<html><p>Body</p><footnote>f1</footnote></html>",
    "created_date": "20190302120000",
    "UpdatedDate": "20190303",
}


@pytest.fixture(scope="module")
def cirnot_doc(spark):
    df = spark.createDataFrame(
        [tuple(CIRNOT_ROW.values())],
        ", ".join(f"`{k}` string" for k in CIRNOT_ROW),
    )
    return cirnot_document(df, templateid="T9").collect()[0]


def test_cirnot_identity_year_groups(cirnot_doc):
    d = cirnot_doc
    assert d["id"] == "C-1" and d["mid"] == "MID-9"
    assert d["templateid"] == "T9" and d["documenttype"] == "circular"
    # packed 22-char year → 18-char id + 4-char name (evident intent of
    # the reference's substring args, ts:3838-3842)
    assert d["year"]["id"] == "111050000000001234"
    assert d["year"]["name"] == "2019"
    # groups: parts 1/2 (0-based), part 0 ignored
    g = d["groups"]["group"]
    assert g["id"] == "111050000000000113" and g["name"] == "Circular"
    assert g["subgroup"]["name"] == "GST Circulars"
    assert g["subgroup"]["url"] == "gst-circulars"
    assert d["heading"] == "Circular No. 5/2019"


def test_cirnot_categories_no_whitelist(cirnot_doc):
    cats = cirnot_doc["categories"]
    assert len(cats) == 1 and cats[0]["id"] == "111050000000018392"
    assert cats[0]["name"] == "Customs"


def test_cirnot_masterinfo_and_associates(cirnot_doc):
    info = cirnot_doc["masterinfo"]["info"]
    assert [s["name"] for s in info["subject"]] == ["Levy", "Scope"]
    # cirnot master = single {name: heading} entry (ts:4139-4143)
    assert [c["name"] for c in info["cirnot"]] == ["Circular No. 5/2019"]
    # acts resolve against the CIRNOT popular dict
    assert [(a["id"], a["name"]) for a in info["act"]] == [
        ("102010000000000337", "Income-tax Act, 1961"),
        ("999999999999999999", "Other Acts"),
    ]
    assert info["act"][0]["catUrls"] == [
        "direct-tax-laws", "international-tax", "transfer-pricing"
    ]
    assert info["section"][0]["name"] == "Section - 88 Refunds"
    # state from the packed masterinfo column (ts:4239-4253)
    assert [(s["id"], s["name"]) for s in info["state"]] == [("ST1", "Delhi")]
    assert info["state"][0]["ordering"] == "delhi"
    # cirnotdoctype is always empty (the reference never assigns its local)
    assert info["cirnotdoctype"] == []
    a = cirnot_doc["associates"]
    assert a["act"][0]["id"] == "102010000000000337"
    assert a["section"][0]["id"] == "S88"
    assert a["affirmreverse"][0]["date"] == "20060605"
    assert a["affirmreverse"][0]["subheading"] == "TheSub"
    assert a["affirmreverse"][0]["associatedDocid"] == "900"
    assert [(e["name"], e["subheading"]) for e in a["expert"]] == [
        ("John Doe", "On GST"), ("Jane", "On Customs")
    ]


def test_cirnot_masterinfo_gated_on_assoc(spark):
    row = dict(CIRNOT_ROW, ActAssociation=None)
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = cirnot_document(df).collect()[0]
    # without ActAssociation the whole info struct is null (ts:4023-4198)
    assert d["masterinfo"]["info"] is None
    assert d["associates"]["affirmreverse"] is None
    # experts are outside the gate
    assert len(d["associates"]["expert"]) == 2


def test_cirnot_ilt_single_tree(cirnot_doc):
    ilt = cirnot_doc["iltinfoes"]
    assert len(ilt) == 1
    t = ilt[0]
    assert t["country1"]["name"] == "India"
    assert t["country2"]["name"] == "Mauritius"
    assert t["country2"]["pid"] == "100"
    assert t["article"]["name"] == "Article 13"
    assert t["article"]["pid"] == ""  # non-'$' branch carries no pid
    assert t["subject"]["id"] == "" and t["subsubject"]["id"] == ""
    silt = cirnot_doc["searchiltcitation"]["formattediltcitation"]
    assert [s["name"] for s in silt] == ["100200300"]


def test_cirnot_ilt_dollar_defaults(spark):
    row = dict(CIRNOT_ROW, iltinfo="100^India|short$100^India|200^Mauritius")
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = cirnot_document(df).collect()[0]
    trees = d["iltinfoes"]
    assert len(trees) == 2
    # '$' branch: short fields default to the 18-zero id
    assert trees[0]["country2"]["id"] == "000000000000000000"
    assert trees[0]["article"]["pid"] == "100" + "000000000000000000"
    assert trees[1]["country2"]["name"] == "Mauritius"
    names = [s["name"] for s in d["searchiltcitation"]["formattediltcitation"]]
    assert names[0] == "100" + "000000000000000000" * 4


def test_cirnot_taginfo_boost_content_dates(cirnot_doc):
    d = cirnot_doc
    # tag = entry part 1 (0-based) — the FIRST '^' pair is skipped
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [("T2", "Beta")]
    # circular group id → 3000 boost, 'circular no' searchboost prefix
    assert d["documenttypeboost"] == 3000
    assert "circular no circular no. 5/2019" in d["searchboosttext"].replace(
        "  ", " "
    ) or "circular no" in d["searchboosttext"]
    assert d["footnotecontent"] == "<footnote>f1</footnote>"
    # chain injects htmmetadata AND appends nodata (ts:4620-4622)
    assert "<div id='htmmetadata' style='display:none;'>" in d["fullcontent"]
    assert d["fullcontent"].endswith("</div>")
    assert "<div id='nodata' style='display:none;'>" in d["fullcontent"]
    assert d["documentdate"] == "20190301"
    assert d["formatteddocumentdate"] == datetime.date(2019, 3, 1)
    assert d["displaydocumentdatestring"] == "20190301"
    assert d["created_date"] == datetime.datetime(2019, 3, 2, 12, 0, 0)
    sug = [(tuple(s["Input"]), s["Weight"]) for s in d["Suggest"]]
    assert sug == [(("levy", "scope"), 18)]


ARTICLE_ROW = {
    "mid": "A-1", "id": "MID-5", "excusdocid": "EX-3",
    "documenttype": "Article", "documentformat": ".HTM",
    "url": "HTTP://X/a.htm", "year": "2021",
    "ExpertSubject": "31|subject^GST Law~2$32|subject^Input Credit~5",
    "actassociations": (
        "102010000000000337|act^Income-tax Act, 1961~3"
        "$102010000000000337#S10|section^10 Exemptions~4"
    ),
    "parentsectioninfo": None,
    "articlesubjectinfo": "AS1^Tax Articles",
    "DDA_Rules": "R1|rule^Valuation Rules$RID#RN1|ruleno^12 Refund",
    "DDA_Caselaw": "77|cited^CIT v. Alpha#20040201@SubH",
    "categoriescentax": "111050000000018392^Centax Customs%1",
    "groups": "G7^Expert Articles^Extra",
    "documentdate": "20210501^01-05-2021",
    "Heading": "GST on Works Contracts",
    "subheading": "An analysis", "sortheading": "GST",
    "sortbyauthor": "Jane", "sortheadingnumber": "N1",
    "shortcontent": " s ",
    "GSTSubjectID": "C1|Levy$C2|Scope",
    "AAAAssociation": "SUB1|Sub^Name@GRP1~Group Name#3:2020",
    "AuthorName": "AU1@Jane Doe~Advocate^http://x#img.png!2",
    "citation": "2021|9^GSTL|3|150",
    "fullcitation": "[2021] 5 GSTL 99J",
    "iltassociation": "100^India#1|200^Mauritius|300^Article 13|x|y",
    "TagInfo": "T1^Alpha|0^0$T9^Z|V1^ok",
    "MarkingInfo": None,
    "fullcontent": "<html><p>B</p></html>",
    "created_date": "20210502120000", "UpdatedDate": "20210503",
}


@pytest.fixture(scope="module")
def article_doc(spark):
    df = spark.createDataFrame(
        [tuple(ARTICLE_ROW.values())],
        ", ".join(f"`{k}` string" for k in ARTICLE_ROW),
    )
    return article_document(df, templateid="T5").collect()[0]


def test_article_identity_groups_cats(article_doc):
    d = article_doc
    assert d["id"] == "A-1" and d["mid"] == "MID-5"
    assert d["documenttypeboost"] == 1000
    assert d["year"]["id"] == "2021"
    # groups: '^'-split, id = part 0, name = part 1, empty subgroup
    assert d["groups"]["group"]["id"] == "G7"
    assert d["groups"]["group"]["name"] == "Expert Articles"
    assert d["groups"]["group"]["subgroup"]["name"] == ""
    assert len(d["categories"]) == 1
    assert d["categories"][0]["name"] == "Customs"
    assert d["searchheadingnumber"] == ""
    assert d["sortbyauthor"] == "jane"
    assert d["parentheadings"] == [
        {"id": "", "name": "", "ordering": ""}
    ] or d["parentheadings"][0]["id"] == ""


def test_article_masterinfo(article_doc):
    info = article_doc["masterinfo"]["info"]
    assert [s["name"] for s in info["subject"]] == ["GST Law", "Input Credit"]
    assert [(a["id"], a["name"]) for a in info["act"]] == [
        ("102010000000000337", "Income-tax Act, 1961")
    ]
    assert info["section"][0]["name"] == "Section - 10 Exemptions"
    # authors via the @-grammar
    a = info["authors"][0]
    assert a["id"] == "AU1" and a["name"] == "Jane Doe"
    assert a["designation"] == "Advocate"
    assert a["socialSiteUrl"] == "http://x"
    assert a["imagePath"] == "img.png" and a["orderInteger"] == 2
    # article GSTSubjectID is '|'-split (not the CaseLaws '^' grammar)
    assert [(c["id"], c["name"]) for c in info["classification"]] == [
        ("C1", "Levy"), ("C2", "Scope")
    ]
    assert info["subclassification"] == []
    # AAA standards/substandards variant
    assert info["standards"][0]["id"] == "GRP1"
    assert info["standards"][0]["name"] == "Group Name"
    s = info["substandards"][0]
    assert s["id"] == "SUB1" and s["pid"] == "GRP1"
    assert s["name"] == "Sub-Name"
    assert s["ordering"] == "3" and s["orderInteger"] == 3
    assert s["year"] == "2020"
    # citations + searchcitation (single no-'$' branch)
    cits = article_doc["masterinfo"]["citations"]
    assert cits[0]["journal"]["name"] == "GSTL"
    sc = article_doc["searchcitation"]["formattedcitation"]
    assert [x["name"] for x in sc] == ["2021" + "9" + "0003" + "0000150"]


def test_article_ilt_single_branch(article_doc):
    ilt = article_doc["masterinfo"]["iltinfoes"]
    assert len(ilt) == 1
    t = ilt[0]
    assert t["country1"]["name"] == "India"
    assert t["country1"]["ordering"] == "1"  # '#'-ordering parsed
    assert t["country2"]["id"] == "200" and t["country2"]["pid"] == "100"
    assert t["article"]["name"] == "Article 13"
    assert t["subject"]["id"] == ""  # short field, '' default (non-'$')
    names = [
        s["name"]
        for s in article_doc["searchiltcitation"]["formattediltcitation"]
    ]
    assert names == ["100200300"]


def test_article_associates_and_otherinfo(article_doc):
    a = article_doc["associates"]
    assert a["act"][0]["id"] == "102010000000000337"
    assert a["subject"][0]["id"] == "AS1"
    assert a["subject"][0]["name"] == "Tax Articles"
    assert a["rule"][0]["id"] == "R1"
    assert a["rule"][0]["name"] == "Valuation Rules"
    rn = a["ruleno"][0]
    assert rn["id"] == "RN1" and rn["associatedDocid"] == "RID"
    assert rn["name"] == "Rule - 12 Refund"
    cr = a["casereferred"][0]
    assert cr["id"] == "77" and cr["name"] == "CIT v. Alpha"
    assert cr["date"] == "20040201"  # raw, no dd-mm-yyyy conversion
    assert cr["subheading"] == "SubH"
    assert cr["associatedDocid"] == "MID-5"
    o = article_doc["otherinfo"]
    assert o["fullcitation"][0]["name"] == "[2021] 5 GSTL 99J"
    # last word '99J' carries a J → 8 similar variants
    assert len(o["similarfullcitation"]) == 8
    assert o["similarfullcitation"][4]["name"] == "[2021] 5 GSTL 99"


def test_article_tags_suggest_content(article_doc):
    d = article_doc
    # tag from part 0; validity from part 1 unless '0^0'
    assert [(t["id"], t["name"], t["validity"]) for t in d["taginfo"]] == [
        ("T1", "Alpha", None), ("T9", "Z", "V1")
    ]
    sug = [(tuple(s["Input"]), s["Weight"]) for s in d["Suggest"]]
    # one entry PER subject
    assert (("gst law",), 18) in sug and (("input credit",), 18) in sug
    assert (("[2021] 5 gstl 99j", "5 gstl 99j"), 1) in sug
    assert "Jane Doe" in d["searchboosttext"]
    assert "<div id='htmmetadata' style='display:none;'>" in d["fullcontent"]
    assert d["fullcontent"].endswith("</html>")
    assert d["xmltag"] == ""
    assert d["formatteddocumentdate"] == datetime.date(2021, 5, 1)
    assert d["created_date"] == datetime.datetime(2021, 5, 2, 12, 0, 0)


def test_article_no_assoc_nulls(spark):
    row = dict(ARTICLE_ROW, actassociations=None, DDA_Rules=None,
               DDA_Caselaw=None, articlesubjectinfo=None)
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = article_document(df).collect()[0]
    info = d["masterinfo"]["info"]
    # act/section/subject gated on the assoc list; authors et al. are not
    assert info["act"] is None and info["subject"] is None
    assert info["authors"][0]["name"] == "Jane Doe"
    assert d["associates"]["rule"] is None
    assert d["associates"]["casereferred"] is None
    assert d["associates"]["subject"] == []


FORM_ROW = {
    "mid": "F-1", "id": "MID-3", "documenttype": "Form",
    "documentformat": ".PDF", "filenamepath": "/x/FormITR1.pdf",
    "url": "http://x/FormITR1.pdf", "year": "2021",
    "DDA_Acts": "A1|act^Customs Act~2$A2#S5|section^5 Levy~3",
    "categoriescentax": "111050000000018400^Centax GST%1",
    "groups": "G1^Forms|SG1^ITR Forms",
    "Heading": "16A Certificate",
    "subheading": "sub", "sortheading": "S", "sortheadingnumber": "16",
    "searchheadingnumber": "16", "language": "EN",
    "FormSubject": "31|subject^ITR~2$x",
    "masterinfo": (
        "M1|language^Hindi#3,Guide#2$M2|form^ITR-1#5$M3|state^Delhi"
        "$M4|formtype^Annual$frmtyp"
    ),
    "TaggingInfo": "222210000000000002|TC1^Repealed Act",
    "documentdate": "20210901^01-09-2021",
    "shortcontent": " s ",
    "fullcontent": "<document><p>B</p></document>",
    "created_date": "20210902120000", "UpdatedDate": "20210903",
}


@pytest.fixture(scope="module")
def form_doc(spark):
    df = spark.createDataFrame(
        [tuple(FORM_ROW.values())],
        ", ".join(f"`{k}` string" for k in FORM_ROW),
    )
    return form_document(df, templateid="T3").collect()[0]


def test_form_heading_year_groups(form_doc):
    d = form_doc
    # digit-leading heading gets the Form- prefix (ts:3445-3451)
    assert d["heading"] == "Form - 16A Certificate"
    assert d["year"]["id"] == "2021"
    # group name/url forced to 'form' for docType 3
    g = d["groups"]["group"]
    assert g["id"] == "G1" and g["name"] == "form" and g["url"] == "form"
    assert g["subgroup"]["name"] == "ITR Forms"
    assert len(d["categories"]) == 1 and d["categories"][0]["name"] == "GST"


def test_form_year_0000_quirk(spark):
    # ANY '0000' substring disables the year — packed 18+4 ids always
    # contain zeros, so they never populate (ts:3232)
    row = dict(FORM_ROW, year="1110500000000012342019")
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = form_document(df).collect()[0]
    assert d["year"] is None


def test_form_masterinfo(form_doc):
    info = form_doc["masterinfo"]["info"]
    # language name KEEPS the '#ordering' text; ordering splits it
    lang = info["language"][0]
    assert lang["name"] == "Hindi#3" and lang["ordering"] == "3"
    assert lang["orderInteger"] == 3
    assert lang["url"] == "/x/FormITR1-Hindi#3.pdf"
    inst = info["instruction"][0]
    assert inst["name"] == "Guide#2" and inst["ordering"] == "2"
    assert inst["url"] == "/x/InstructionsITR1-Hindi#3.pdf".replace(
        "InstructionsITR1", "Instructions" + "ITR1"
    ) or "Instructions" in inst["url"]
    assert info["form"][0]["name"] == "ITR-1"
    assert info["form"][0]["orderInteger"] == 5
    assert info["state"][0]["name"] == "Delhi"
    assert info["formtype"][0]["name"] == "Annual"
    assert [s["name"] for s in info["subject"]] == ["ITR"]
    fn = info["formno"][0]
    assert fn["name"] == "Form - 16A Certificate"
    # first space only removed in the url (JS replace)
    assert fn["url"] == "form- 16a certificate"
    # filenamepath overwritten by the LAST language url (ts:3544)
    assert form_doc["filenamepath"] == "/x/FormITR1-Hindi#3.pdf"


def test_form_assoc_tags_boost_content(form_doc):
    d = form_doc
    a = d["associates"]
    # act name keeps the '~ordering' tail (no split in FormIndex)
    assert a["act"][0]["name"] == "Customs Act~2"
    s = a["section"][0]
    assert s["id"] == "S5" and s["associatedDocid"] == "A2"
    assert s["name"] == "Section - 5 Levy" and s["ordering"] == "3"
    # whole-string taginfo (the '$' branch is unreachable)
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [
        ("TC1", "Repealed Act")
    ]
    assert d["documenttypeboost"] == 0  # repealed
    assert "<div id='xmlmetadata' style='display:none;'>" in d["fullcontent"]
    assert d["fullcontent"].endswith("</document>")
    sug = [(tuple(x["Input"]), x["Weight"]) for x in d["Suggest"]]
    assert (("itr",), 18) in sug
    assert (("form - 16a certificate",), 1) in sug
    assert d["created_date"] == datetime.datetime(2021, 9, 2, 12, 0, 0)
    assert d["updated_date"] == datetime.datetime(2021, 9, 3, 0, 0, 0)
    # '$frmtyp' present → masterinfo text participates in searchboost
    assert "hindi" in d["searchboosttext"] or "itr" in d["searchboosttext"]


def test_news_document(spark):
    row = {
        "mid": "N-1", "id": "MID-8", "documenttype": "News",
        "documentformat": ".htm", "url": "HTTP://X/n.htm",
        "categoriescentax": "111050000000018392^Centax Customs%1",
        "groups": "G1^Top News#1|SG1^GST News#2|SSG1^Rates#3",
        "Heading": "  Breaking update  ",
        "subheading": " sub ", "sortheading": "B",
        "sortheadingnumber": "1", "searchheadingnumber": "1",
        "language": "EN", "MarkingInfo": None,
        "TagInfo": "T1^A|T2^B",
        "documentdate": "20240101^01-01-2024",
        "shortcontent": " s ",
        "fullcontent": "<html><p>B</p></html>",
        "created_date": "20240102120000", "UpdatedDate": "20240103120000",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = news_document(df, templateid="T8").collect()[0]
    # heading NOT trimmed (ts:8225)
    assert d["heading"] == "  Breaking update  "
    # whitelist applies but NO final 3-id filter / centax strip
    assert d["categories"][0]["name"] == "Centax Customs"
    g = d["groups"]["group"]
    assert g["name"] == "Top News"
    assert g["subgroup"]["name"] == "GST News"
    assert g["subgroup"]["ordering"] == "2"
    assert g["subgroup"]["subsubgroup"]["name"] == "Rates"
    assert g["subgroup"]["subsubgroup"]["url"] == "rates"
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [("T2", "B")]
    assert "<div id='htmmetadata' style='display:none;'>" in d["fullcontent"]
    assert d["documentdate"] == "20240101"
    assert d["created_date"] == datetime.datetime(2024, 1, 2, 12, 0, 0)
    assert d["updated_date"] == datetime.datetime(2024, 1, 3, 12, 0, 0)


def test_treaty_document(spark):
    row = {
        "mid": "TR-1", "id": "MID-6", "documenttype": "Treaty",
        "documentformat": ".htm", "url": "HTTP://X/t.htm",
        "categoriescentax": "111050000000018392^Centax ILT%1",
        "groups": (
            "G1^Treaties#1|SG^DTAA#2|111050000000011127^Model Treaties#3"
            "|YY^2019"
        ),
        "Hasfile": "Yes", "ParentHeading": None, "ShortName": "IN-MU",
        "associates": "AS1^Mauritius Treaty#7",
        "documentdate": "20190101^01-01-2019",
        "Heading": "India|Mauritius DTAA",
        "subheading": " s ", "sortheadingnumber": "N5",
        "searchheadingnumber": "N5",
        "iltassociation": "100^India|200^Mauritius|300^Article 13#2|x|y",
        "flaginfo": "in|mu'",
        "shortcontent": " sc ", "fullcontent": "<p>body</p>",
        "created_date": "20190102120000", "UpdatedDate": "20190103120000",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = treaty_document(df, doc_type=8, templateid="T6").collect()[0]
    # year derives from the groups tail after the last '^'
    assert d["year"]["id"] == "2019"
    # 4-level groups with '#'-orderings
    g = d["groups"]["group"]
    assert g["name"] == "Treaties" and g["ordering"] == "1"
    assert g["subgroup"]["name"] == "DTAA"
    assert g["subgroup"]["subsubgroup"]["name"] == "Model Treaties"
    assert g["subgroup"]["subsubgroup"]["subsubsubgroup"]["name"] == "2019"
    # model-treaties group + non-special mid → '30' prefix (ts:6164-6168)
    assert d["sortheadingnumber"] == "30n5"
    # default parentheadings with Hasfile-derived hasfile
    p = d["parentheadings"][0]
    assert p["id"] == "0" * 18 and p["hasfile"] == "yes"
    # packed associates → subject with '#'-ordering
    s = d["associates"]["subject"][0]
    assert s["id"] == "AS1" and s["name"] == "Mauritius Treaty"
    assert s["ordering"] == "7"
    # treaty ilt: skipped fields stay fully empty (no type)
    t = d["masterinfo"]["iltinfoes"][0]
    assert t["country2"]["name"] == "Mauritius"
    assert t["article"]["ordering"] == "2"
    assert t["article"]["pid"] == "100200"
    assert t["subject"]["type"] == ""  # empty struct, not typed-empty
    assert t["flag1"]["name"] == "IN" and t["flag2"]["name"] == "MU"
    assert t["flag2"]["url"] == "mu"  # quote stripped
    names = [
        x["name"] for x in d["searchiltcitation"]["formattediltcitation"]
    ]
    assert names == ["100" + "200" + "300" + "0" * 18 + "0" * 18 + "2019"]
    sug = [(tuple(x["Input"]), x["Weight"]) for x in d["Suggest"]]
    assert (("india", "mauritius"), 8) in sug
    assert (("article 13",), 1) in sug
    assert not any(w == 16 for _i, w in sug)  # no subject names
    assert d["documenttypeboost"] == 2000
    assert d["heading"] == "India|Mauritius DTAA"
    assert d["categories"][0]["name"] == "Centax ILT"  # no final filter
    assert d["fullcontent"].endswith("</div>")  # nodata appended


def test_commentary_document(spark):
    row = {
        "mid": "CM-1", "id": "MID-2", "documenttype": "Commentary",
        "documentformat": ".htm", "url": "http://x/c.htm", "year": "2010",
        "OtherSubject": "31|subject^DTC~2$x",
        "DDA_Acts": (
            "A1|act^Income Tax Act$A2#S9|section^9 Residence~4"
        ),
        "AAAAssociation": (
            "SUB1|s^One@GRP1~Group A$SUB2|s^Two@GRP1~Group A$SUB3|s^Three@GRP2~Group B"
        ),
        "DDA_Rules": "R1|rule^Valuation Rules$RID#RN1|ruleno^12 Refund",
        "categoriescentax": "111050000000018392^Centax Customs%1",
        "groups": (
            "G1^Commentaries#1|111050000000000153^Old Name#2"
            "|SS^Chapters#3|111050000000017782^Ignored#4"
        ),
        "documentdate": "20100301^x",
        "Heading": "9 Residence in India",
        "subheading": "sub", "sortheading": "S", "sortheadingnumber": "9",
        "searchheadingnumber": "9",
        "ParentFile": "FileYes",
        "parentidheading": "|111050000000099999^II#4|P2^Parent Two#7",
        "masterinfo": "m",
        "shortcontent": " s ",
        "fullcontent": "<document><p>B</p></document>",
        "MarkingInfo": None, "TagInfo": "T1^Alpha|T2^Beta",
        "created_date": "20100302120000", "UpdatedDate": "20100303",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = commentary_document(df, templateid="TC").collect()[0]
    assert d["documenttypeboost"] == 900
    # subgroup id-keyed override
    assert d["groups"]["group"]["subgroup"]["name"] == "DTC Bill, 2010"
    assert (
        d["groups"]["group"]["subgroup"]["subsubgroup"]["subsubsubgroup"][
            "name"
        ]
        == "Finance (No. 2) Act, 2019"
    )
    # DTC-2010 heading: numeric lead → Section- prefix
    assert d["heading"] == "Section - 9 Residence in India"
    # the section-associate-into-act-list bug (ts:6634)
    a = d["associates"]
    assert [x["type"] for x in a["act"]] == ["act", "section"]
    assert a["act"][1]["name"] == "Section - 9 Residence"
    assert a["act"][1]["associatedDocid"] == "A2#S9"
    assert a["section"] == []
    # masterinfo acts/sections are properly separated
    info = d["masterinfo"]["info"]
    assert [x["name"] for x in info["act"]] == ["Income Tax Act"]
    # act ordering falls back to lowercase name without '~'
    assert info["act"][0]["ordering"] == "income tax act"
    assert info["section"][0]["id"] == "S9"
    # AAA standards dedup (first wins), substandards keep all
    assert [s["id"] for s in info["standards"]] == ["GRP1", "GRP2"]
    assert len(info["substandards"]) == 3
    assert a["rule"][0]["name"] == "Valuation Rules"
    assert a["ruleno"][0]["name"] == "Rule - 12 Refund"
    # parentheadings present (>15-char id) with Chapter prefix path off
    # (subgroup url 'dtc-bill,-2010' has no 'direct-tax-code')
    p = d["parentheadings"][0]
    assert p["id"] == "111050000000099999" and p["name"] == "II"
    assert p["ordering"] == "4" and p["orderInteger"] == 4
    assert p["hasfile"] == "yes"
    assert p["pid"] == "P2" and p["pname"] == "Parent Two"
    assert d["searchboosttext"] != ""
    # '||'-chain: only the </document> injection is reachable
    assert "<div id='xmlmetadata'" in d["fullcontent"]
    sug = [(tuple(x["Input"]), x["Weight"]) for x in d["Suggest"]]
    assert sug == [(("dtc",), 18)]
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [
        ("T1", "Alpha"), ("T2", "Beta")
    ]


def test_commentary_form_branch_and_html_quirk(spark):
    row = {
        "mid": "CM-2", "id": "M", "documenttype": "Commentary",
        "documentformat": ".htm", "url": "u", "year": "",
        "OtherSubject": None, "DDA_Acts": None, "AAAAssociation": None,
        "DDA_Rules": None,
        "categoriescentax": None,
        "groups": "111050000000000971^Models & Drafts#1|SG^Drafts#2",
        "documentdate": "", "Heading": "Draft deed",
        "subheading": "", "sortheading": "", "sortheadingnumber": "",
        "searchheadingnumber": "", "ParentFile": None,
        "parentidheading": None, "masterinfo": None, "shortcontent": "",
        "fullcontent": "<html><p>B</p></html>",
        "MarkingInfo": None, "TagInfo": None,
        "created_date": "", "UpdatedDate": "",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = commentary_document(df).collect()[0]
    assert d["documenttype"] == "form" and d["documenttypeboost"] == 7500
    g = d["groups"]["group"]
    assert g["id"] == "111050000000000026" and g["name"] == "form"
    assert g["subgroup"]["name"] == "Models & Drafts"
    assert g["subgroup"]["subsubgroup"]["name"] == "Drafts"
    # the '||'-chain quirk: </html> docs get NO metadata div
    assert "metadata" not in d["fullcontent"]
    assert d["fullcontent"] == "<html><p>B</p></html>"
    # null TagInfo → one null tag
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [(None, None)]
    # null parentidheading → the 18-zero DEFAULT still passes the >15
    # check (ts:6963-6964), so a blank parentheading + sbt materialize
    p = d["parentheadings"][0]
    assert p["id"] == "0" * 18 and p["name"] == "" and p["hasfile"] == "no"
    assert d["searchboosttext"] != ""


def test_commentary_book_document(spark):
    row = {
        "mid": "BK-1", "id": "M", "documenttype": "Book",
        "documentformat": ".htm", "filenamepath": "/x/b.htm",
        "url": "http://x/b.htm", "year": "2020",
        "masterinfo": "PROD9|15-01-2020|Practice",
        "categoriescentax": "111050000000018392^Centax Customs%1",
        "groups": (
            "G^Books#1|SG^Set#2|SS^Vol#3|111050000000000108^X#4|L5^Leaf#5"
        ),
        "documentdate": "20200101^x",
        "Heading": "12 Refund",
        "subheading": "s", "sortheading": "", "sortheadingnumber": "",
        "searchheadingnumber": "", "ParentFile": "fileyes",
        "parentidheading": "111050000000099999^III#2|P^PN#1",
        "language": "EN", "shortcontent": "",
        "fullcontent": "<html><p>B</p></html>",
        "MarkingInfo": None, "TagInfo": "T1^A|0^0",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = commentary_book_document(df, templateid="TB").collect()[0]
    assert d["documenttypeboost"] == 20
    info = d["masterinfo"]["info"]
    assert info["prodid"][0]["id"] == "PROD9"
    assert info["dateofpublication"][0]["name"] == "15-01-2020"
    assert info["booktype"][0]["name"] == "Practice"
    # 5-level groups; Finance Act override keyed by year 2020
    g = d["groups"]["group"]
    ss3 = g["subgroup"]["subsubgroup"]["subsubsubgroup"]
    assert ss3["name"] == "Finance Act, 2020"
    assert ss3["subsubsubsubgroup"]["name"] == "Leaf"
    # book keeps whitelisted categories (no final filter / centax strip)
    assert d["categories"][0]["name"] == "Centax Customs"
    # 17984/17981 markers absent → heading passthrough
    assert d["heading"] == "12 Refund"
    assert d["parentheadings"][0]["name"] == "III"
    # flat '|'-pieces taginfo, 0^0 NOT excluded
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [
        ("T1", "A"), ("0", "0")
    ]
    assert "<div id='htmmetadata'" in d["fullcontent"]


def test_aaa_document(spark):
    row = {
        "mid": "AA-1", "id": "M", "documenttype": "AAA",
        "documentformat": ".htm", "url": "http://x/a.htm",
        "CompareFileInfo": "X|path.pdf^Compare Heading",
        "year": "2021",
        "categoriescentax": "C1^Name One%2|111050000000018392^Tax%2",
        "groups": "PFX|G1^Standards|SG^AS|SS^Level3",
        "Heading": "AS 1 Disclosure",
        "subheading": "s", "sortheadingnumber": "42",
        "masterinfo": (
            "I1|industry^Textiles#2$C1|company^Acme Ltd#3"
            "$S1|Account Standard^AS 1: Disclosure#4"
        ),
        "AAAAssociation": "S2|Account Standard^AS 2: Stocks#5$I9|Ind AS^Ind AS 101: First#6",
        "TagInfo": "T1^A|T2^B",
        "paragraphinfo": "111050000000000001C77|3@Para Name",
        "shortcontent": " s ", "fullcontent": "<p>B</p>",
        "documentdate": "2021-05-01 00:00:00",
        "created_date": "2021-05-02T10:00:00", "UpdatedDate": "",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = aaa_document(df, templateid="TA").collect()[0]
    assert d["documenttypeboost"] == 950
    # the boolean-year quirk
    assert d["year"]["id"] == "true" and d["year"]["name"] == "true"
    # groups offset: group = part 1
    g = d["groups"]["group"]
    assert g["id"] == "G1" and g["name"] == "Standards"
    assert g["subgroup"]["name"] == "AS"
    assert g["subgroup"]["subsubgroup"]["name"] == "Level3"
    info = d["masterinfo"]["info"]
    assert info["industry"][0]["name"] == "Textiles"
    assert info["industry"][0]["ordering"] == "2"
    assert info["company"][0]["name"] == "Acme Ltd"
    # masterinfo AS + association AS appended
    assert [x["name"] for x in info["accountingstandard"]] == [
        "AS 1: Disclosure", "AS 2: Stocks"
    ]
    assert info["accountingstandard"][1]["shortName"] == "AS 2"
    assert info["accountingstandard"][1]["orderInteger"] == 5
    assert info["indas"][0]["shortName"] == "Ind AS 101"
    assert d["sortnumber"] == 42
    assert d["sortheadingnumber"] == "42"
    p = d["paragraphinfo"][0]
    assert p["pid"] == "111050000000000001" and p["cid"] == "C77"
    assert p["ordering"] == 3 and p["name"] == "Para Name"
    assert d["comparefileheading"] == "Compare Heading"
    assert d["comparefilecontent"] is None
    assert d["documentdate"] == "2021-05-01 00:00:00"
    assert d["formatteddocumentdate"] == datetime.date(2021, 5, 1)
    assert d["created_date"] == datetime.datetime(2021, 5, 2, 10, 0, 0)
    assert [(t["id"], t["name"]) for t in d["taginfo"]] == [("T2", "B")]


def test_aaa_model_report_document(spark):
    row = {
        "mid": "MR-1", "id": "M", "documenttype": "ModelReport",
        "documentformat": ".htm", "url": "u",
        "fullcontent": "<header><meta>x</meta></header><p>B</p>",
        "year": "111050000000000001^2021",
        "categoriescentax": "111050000000018392^Tax%1",
        "groups": "G^Reports#1|SG^Audit#2",
        "Heading": "Model Report", "subheading": "s",
        "associates": "111050000000000111^Textile|111050000000000222^Acme",
        "AreaID": "111050000000000333^Area Name#2",
        "ClauseID": "111050000000000444^Clause Name#3",
        "Opinion": "x^Short", "Topic": "111050000000000555^Topic Name#4",
        "documentdate": "20210101^x", "created_date": "20210102120000",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = aaa_model_report_document(df).collect()[0]
    assert d["year"]["id"] == "111050000000000001"
    assert d["year"]["name"] == "2021"
    info = d["masterinfo"]["info"]
    assert info["industry"][0]["name"] == "Textile"
    assert info["company"][0]["name"] == "Acme"
    assert info["area"][0]["name"] == "Area Name"
    assert info["area"][0]["ordering"] == "2"
    assert info["clause"][0]["name"] == "Clause Name"
    assert info["opinions"] == []  # id too short
    assert info["topics"][0]["name"] == "Topic Name"
    # inverted !-guards: dates always 1900-01-01
    assert d["formatteddocumentdate"] == datetime.date(1900, 1, 1)
    assert d["created_date"] == datetime.datetime(1900, 1, 1)
    # only the header-strip branch assigns fullcontent
    assert d["fullcontent"] != "" and "<header>" not in d["fullcontent"]
    assert d["xmltag"] != ""
    assert d["sortheadingnumber"] == "0"
    assert d["boostpopularity"] == 10


def test_case_laws_partial_document(spark):
    row = {
        "mid": "P-1", "id": "M",
        "actassociations": (
            "102010000000000152|act^Customs Act, 1962~3"
            "$102010000000000152#S88|section^88 Refunds~4"
        ),
        "parentsectioninfo": None,
        "CaComparison": (
            "X^Y^S56^Sec 56 Old^102010000000000112"
            "|A^B^S66^Sec 66 New^102010000000000793$x|y"
        ),
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = case_laws_partial_document(df).collect()[0]
    info = d["masterinfo"]["info"]
    assert info["act"][0]["id"] == "102010000000000152"
    assert info["section"][0]["name"] == "Section - 88 Refunds"
    assert d["associates"]["act"][0]["id"] == "102010000000000152"
    sug = [(tuple(x["Input"]), x["Weight"]) for x in d["Suggest"]]
    assert (("customs act, 1962",), 20) in sug
    assert (("section - 88 refunds",), 1) in sug
    ca = d["ca_comparison"][0]
    assert ca["id"] == "S56" and ca["name"] == "Sec-56 Old"
    assert ca["actname"] == "Companies Act, 1956"
    assert ca["ca2013section"][0]["id"] == "S66"
    assert ca["ca2013section"][0]["name"] == "Sec-66 New"


def test_case_finder_documents(spark):
    long_name = "International Taxation Subject"
    row = {
        "mid": "CASE-9", "id": "M",
        "DTDInfo": (
            "DG-1$100~India^200~United States of America"
            f"^300~Article 7 Business Profits^400~{long_name}^x~y^PS9~z"
            "@Tld Heading^<p>digest body</p>"
            "|DG-2$101~France@H2^B2"
        ),
        "documentformat": ".HTM", "url": "http://x/d.htm", "year": "2020",
        "actassociations": (
            "102010000000000337|act^Income-tax Act, 1961~3"
            "$102010000000000337#S10|section^10 Exemptions~4"
        ),
        "categoriescentax": "111050000000018392^Centax Customs%1",
        "groups": "G1^|Income Tax^Finder Group",
        "documentdate": "20200101^01-01-2020",
        "Heading": "Alpha v. Beta", "subheading": "s",
        "sortheading": "A", "sortbycourt": "SC", "sortbyname": "A",
        "sortbyauthor": "", "searchheadingnumber": "N",
        "court": "C1^SC^Supreme Court", "bench": "B1^DB^Division Bench",
        "benchtype": "1112700000000000^LB^Larger Bench",
        "InfavourofText": "1^Assessee",
        "citation": "2020|9^ITR|3|150",
        "fullcitation": "[2020] 1 ITR 5|[2020] 2 GSTL 9",
        "judgename": "J1^Judge One|J2^Judge Two",
        "counselnameappellant": "CA1^Adv A",
        "counselnamerespondent": "CR1^Adv R",
        "appealno": "AP1^CA 12/2020|plain",
        "asstyr": "2019-20|2020-21",
        "partyname1": "Alpha", "partyname2": "Beta",
        "shortcontent": " s ", "created_date": "20200102120000",
    }
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    docs = case_finder_documents(df, templateid="TF").collect()
    assert len(docs) == 2  # one per DTDInfo '|' entry
    d = docs[0]
    assert d["id"] == "DG-1" and d["caseid"] == "CASE-9"
    assert d["documenttype"] == "digest"
    assert d["documenttypeboost"] == 0
    assert d["tldheading"] == "Tld Heading"
    assert d["fullcontent"] == "<p>digest body</p>"
    # broken hasOwnProperty → every act is Other Acts; sections empty
    info = d["masterinfo"]["info"]
    assert info["act"][0]["id"] == "999999999999999999"
    assert info["act"][0]["name"] == "Other Acts"
    assert info["section"][0]["name"] == ""
    assert info["court"][0]["shortName"] == "SC"
    assert info["benchtype"][0]["name"] == "Larger Bench"
    assert info["infavourof"][0]["name"] == "Assessee"
    # digest ilt: >15-char names fill; short ones zero-fill
    t = d["masterinfo"]["iltinfoes"][0]
    assert t["country1"]["name"] == "India"
    assert t["country2"]["name"] == "United States of America"
    assert t["article"]["name"] == "Article 7 Business Profits"
    assert t["subject"]["name"] == long_name
    assert t["subject"]["pSubId"] == "PS9"
    assert t["subsubject"]["id"] == "0" * 18
    names = [
        x["name"] for x in d["searchiltcitation"]["formattediltcitation"]
    ]
    assert names == ["100" + "200" + "300" + "400" + "0" * 18]
    assert d["heading"] == "Alpha v. Beta[01-01-2020]"
    o = d["otherinfo"]
    assert o["fullcitation"][0]["name"] == "[2020] 1 ITR 5/[2020] 2 GSTL 9"
    assert [j["name"] for j in o["judge"]] == ["Judge One", "Judge Two"]
    assert [c["type"] for c in o["counselname"]] == [
        "counselnameappellant", "counselnamerespondent"
    ]
    assert o["appealno"][0]["name"] == "CA 12/2020"
    assert (o["appealno"][1]["id"], o["appealno"][1]["name"]) == (
        "plain", "plain"
    )
    assert [a["name"] for a in o["asstyr"]] == ["2019-20", "2020-21"]
    assert [p["type"] for p in o["partyname"]] == [
        "partyname1", "partyname2"
    ]
    sc = d["searchcitation"]["formattedcitation"]
    assert [x["name"] for x in sc] == ["2020" + "9" + "0003" + "0000150"]
    # second digest: short country name → zero-filled country2
    d2 = docs[1]
    assert d2["id"] == "DG-2"
    assert d2["tldheading"] == "H2"


def test_marking_variant_routing(spark):
    # text lowercased in the CirNot/Commentary/Book/Article loops; raw in
    # CaseLaws/News; parentmarking case only preserved in News
    raw = "TOP Story|img^Head##Desc@@iX~20200101\\20200102_@@eP1@@tP2"
    row = dict(CIRNOT_ROW, MarkingInfo=raw)
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    d = cirnot_document(df).collect()[0]
    assert d["markinginfo"][0]["text"] == "top story"
    case_row = dict(CASE_ROW, MarkingInfo=raw)
    df = spark.createDataFrame(
        [tuple(case_row.values())], ", ".join(f"`{k}` string" for k in case_row)
    )
    d = case_laws_document(df).collect()[0]
    assert d["markinginfo"][0]["text"] == "TOP Story"


def test_pipeline_composes_with_structured_streaming(spark, tmp_path):
    """The composed pipelines are pure map stages, so they lift directly
    onto a readStream source — the streaming route for continuously
    arriving documents (pairs with streaming/ingest.py for the index
    side)."""
    src = str(tmp_path / "src")
    row = dict(CIRNOT_ROW)
    df = spark.createDataFrame(
        [tuple(row.values())], ", ".join(f"`{k}` string" for k in row)
    )
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = cirnot_document(stream, templateid="TS")
    assert out.isStreaming
    q = (
        out.select("id", "documenttypeboost", "heading")
        .writeStream.format("memory")
        .queryName("cirnot_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("select * from cirnot_stream").collect()
    finally:
        q.stop()
    assert len(got) == 1
    assert got[0]["id"] == "C-1" and got[0]["documenttypeboost"] == 3000


def test_parse_act_associations_empty(spark):
    df = spark.createDataFrame([(None, None)], "a string, p string")
    got = df.select(
        parse_act_associations(F.col("a"), F.col("p")).alias("o")
    ).collect()[0]["o"]
    assert got["acts"] == [] and got["sections"] == []
    assert got["actassociations"] == [] and got["sectionassociations"] == []


def test_all_pipelines_survive_all_null_row(spark):
    """The reference's DataTable hands every column as DBNull-able; each
    composed pipeline must process a fully-null row without raising (the
    reference's per-row catch would drop it — we emit a row of defaults,
    which is strictly more useful and documented per-pipeline)."""
    from solr_indexing_spark.docprep import pipelines as P

    cases = [
        (P.case_laws_document, P.CASE_LAWS_INPUT_COLUMNS),
        (P.act_rule_document, P.ACT_RULE_INPUT_COLUMNS),
        (P.cirnot_document, P.CIRNOT_INPUT_COLUMNS),
        (P.article_document, P.ARTICLE_INPUT_COLUMNS),
        (P.form_document, P.FORM_INPUT_COLUMNS),
        (P.news_document, P.NEWS_INPUT_COLUMNS),
        (P.treaty_document, P.TREATY_INPUT_COLUMNS),
        (P.commentary_document, P.COMMENTARY_INPUT_COLUMNS),
        (P.commentary_book_document, P.COMMENTARY_BOOK_INPUT_COLUMNS),
        (P.aaa_document, P.AAA_INPUT_COLUMNS),
        (P.aaa_model_report_document, P.AAA_MODEL_REPORT_INPUT_COLUMNS),
        (P.case_laws_partial_document, P.CASE_PARTIAL_INPUT_COLUMNS),
    ]
    # degenerate shapes: all-null (DBNull), empty strings, lone/mixed
    # delimiters, and digit strings that LOOK like dates but aren't —
    # the reference's JS new Date(garbage) yields Invalid Date and the
    # row survives; an ANSI to_date would crash instead (regression class
    # fixed via try_to_date/try_to_timestamp)
    probes = [None, "", "$", "|", "$|^#~@", "99999999"]
    for fn, cols in cases:
        # one DataFrame with one row per probe shape — a single job per
        # pipeline (each submission pays the ~20s plan-construction
        # constant, so per-probe jobs would be 6x slower)
        df = spark.createDataFrame(
            [tuple([val] * len(cols)) for val in probes],
            ", ".join(f"`{c}` string" for c in cols),
        )
        rows = fn(df).collect()
        assert len(rows) == len(probes), fn.__name__
        # null row: identity defaults to ''
        assert any(r["id"] == "" for r in rows), fn.__name__
    # CaseFinder explodes per DTDInfo entry: a null DTDInfo row yields
    # ZERO digests (the reference's outer digestdocs null-guard)
    df = spark.createDataFrame(
        [tuple([None] * len(P.CASE_FINDER_INPUT_COLUMNS))],
        ", ".join(f"`{c}` string" for c in P.CASE_FINDER_INPUT_COLUMNS),
    )
    assert P.case_finder_documents(df).count() == 0
