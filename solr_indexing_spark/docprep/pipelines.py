"""Per-doctype pipeline assembly — packed input row → nested IndexDocument.

The reference's actual deliverable is the composed document: each indexer
(solrIndexCreation.ts §2.11) turns one wide row of delimiter-packed strings
into one deeply nested Solr document (schema indexDocument.ts:111-181).
Round 1 shipped every *operator*; this module composes them:

- ``case_laws_document`` — the flagship CaseLawsIndex pipeline
  (solrIndexCreation.ts:890-2955): categories, groups, the 5 citation sort
  keys, masterinfo (classifications, court/bench/benchtype/infavourof/
  services/AS/IndAS, citations, iltinfo trees), associates (act/section with
  popular-acts lookup + parent-section override, casereferred/affirmreverse/
  slp/cirnot), taginfo/markinginfo/headnotes, court boost, Suggest,
  searchboosttext/headnotestext, footnote/header/metadata-div content
  handling, dates and flags, final category filter.
- ``act_rule_document`` — ActRuleIndex (solrIndexCreation.ts:27-888):
  heading classification (Section-/Rule-/Regulation-/Article-), docType-
  dependent parentheadings (1-level vs 2-level), subgroup year suffixes,
  AAA standards, synthetic ruleno masterinfo, TaggingInfo/AlliedInfo tags,
  repealed-act boost zeroing, the ActRule searchboosttext recipe.

Execution shape: ONE narrow ``select`` per pipeline — no shuffle, no
explode/groupBy re-aggregation; every nested field is a Catalyst expression
over the row's own packed columns (the popular-acts dimension is folded in
as a literal map — 138 entries — so the J1 lookup is a map probe inside
codegen, not a join). The only Python in the path is the MarkingInfo Arrow
UDF. At 100 TB this is a pure map stage: it scales with the scan and
partition count, with zero exchanges.

Faithful-quirk notes (deviations are documented here, not silent):
- The reference pushes court/bench/benchtype/infavourof Suggest entries
  only when the name is EMPTY (inverted ``if (!name.trim())`` guards,
  ts:2047,2067,2089,2108) — net effect zero usable suggestions, so we emit
  none for those kinds.
- The ``.htm`` footnote branch uses JSDOM node removal (ts:2781-2792); we
  remove ``div.footprint`` elements by non-greedy regex — identical on
  non-nested footprint divs (the reference's own data shape), simpler at
  scale than shipping a DOM into the executor.
- JS ``substring(4,2)`` date bugs are NOT replicated; dates parse as the
  evident yyyymmdd[hhmmss] intent (SURVEY.md §2.8-F5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .citations import (
    citation_sort_keys,
    full_citation_name,
    parse_citations,
    search_citation_names,
    similar_full_citations,
    sortheadingnumber_from_citations,
)
from .enrich import OTHER_ACT_ID, OTHER_ACT_NAME, OTHER_ACT_ORDERING
from .grammars import (
    filter_final_categories,
    headnotes_array,
    headnotes_text,
    parse_categories,
    parse_groups,
    parse_marking_info,
    tokenize_crosstagging,
)
from .masterinfo import (
    ilt_suggest_inputs,
    parse_aaa_association,
    parse_arinfo_caselaw,
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
from .popular_acts_data import VARIANTS, other_act_cat_urls
from .scalars import (
    classify_heading,
    court_boost,
    get_meta_tag,
    parse_docdate,
    remove_special_with_space,
    removed_header_tag,
    slugify,
    string_only,
    strip_trailing_dot,
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _f(parts: Column, i: int) -> Column:
    return F.try_element_at(parts, F.lit(i))


def _s(name: str) -> Column:
    """Column as string, null-safe empty."""
    return F.coalesce(F.col(name).cast("string"), F.lit(""))


def ensure_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Add any missing input columns as null strings — the reference's
    DataTable addressing is by name with pervasive null guards, so a
    subset-schema input must behave like a full row of nulls."""
    present = set(df.columns)
    for c in cols:
        if c not in present:
            df = df.withColumn(c, F.lit(None).cast("string"))
    return df


def popular_acts_map(variant: str = "case_final") -> Column:
    """The popular-acts dictionary as a literal MapType expression
    (id → name). 138 entries stay well under expression-size limits and
    make the J1 lookup a codegen map probe — zero shuffle, zero join."""
    rows, _ = VARIANTS[variant]
    args: list[Column] = []
    for act_id, act_name, _urls in rows:
        args.append(F.lit(act_id))
        args.append(F.lit(act_name))
    return F.create_map(*args)


def popular_acts_cat_map(variant: str = "case_final") -> Column:
    """id → cat_urls csv companion map."""
    rows, _ = VARIANTS[variant]
    args: list[Column] = []
    for act_id, _name, urls in rows:
        args.append(F.lit(act_id))
        args.append(F.lit(urls))
    return F.create_map(*args)


# --- act/section associations (ts:1113-1259) -------------------------------


def _suggest(inputs: Column, weight: int) -> Column:
    return F.when(
        F.size(inputs) > 0,
        F.struct(inputs.alias("Input"), F.lit(weight).alias("Weight")),
    )


def parse_act_associations(
    assoc_col: Column | str,
    parent_info_col: Column | str,
    variant: str = "case_final",
) -> Column:
    """actassociations ('$'-list of ``id#secid|type^name~ordering``) →
    struct{acts, actassociations, sections, sectionassociations,
    act_names, section_names}.

    type=='act' elements resolve against the popular-acts dictionary
    (hit → dictionary row + catUrls; miss → the synthetic "Other Acts"
    row, ts:1137-1164). Other types are sections: "Section - " prefixed
    when numeric-leading, parent-section override from parentsectioninfo
    (substring containment, LAST match wins — grammars.parent_section_lookup
    semantics inlined per element, ts:1175-1248)."""
    c = F.coalesce(_c(assoc_col), F.lit(""))
    pinfo = F.coalesce(_c(parent_info_col), F.lit(""))
    pmap = popular_acts_map(variant)
    cmap = popular_acts_cat_map(variant)
    default_cats = ",".join(other_act_cat_urls(variant))
    elems = F.filter(
        F.split(c, r"\$"), lambda e: F.size(F.split(e, r"\|")) > 1
    )

    def parts_of(e: Column):
        p = F.split(e, r"\|")
        first, second = F.trim(_f(p, 1)), _f(p, 2)
        typ = F.lower(F.coalesce(_f(F.split(second, r"\^"), 1), F.lit("")))
        nameord = _f(F.split(second, r"\^"), 2)
        name = F.coalesce(_f(F.split(nameord, "~"), 1), F.lit(""))
        ordering = F.coalesce(_f(F.split(nameord, "~"), 2), F.lit(""))
        return first, typ, name, ordering

    def is_act(e: Column) -> Column:
        _, typ, _, _ = parts_of(e)
        return F.trim(typ) == "act"

    act_elems = F.filter(elems, is_act)
    sec_elems = F.filter(elems, lambda e: ~is_act(e))

    def act_struct(e: Column) -> Column:
        aid, typ, name, ordering = parts_of(e)
        hit = F.element_at(pmap, aid)
        res_name = F.coalesce(hit, F.lit(OTHER_ACT_NAME))
        return F.struct(
            F.when(hit.isNotNull(), aid).otherwise(F.lit(OTHER_ACT_ID)).alias("id"),
            typ.alias("type"),
            F.when(hit.isNotNull(), name).otherwise(F.lit(OTHER_ACT_NAME)).alias("name"),
            F.when(hit.isNotNull(), ordering).otherwise(
                F.lit(OTHER_ACT_ORDERING)
            ).alias("ordering"),
            slugify(
                F.lower(F.when(hit.isNotNull(), name).otherwise(res_name))
            ).alias("url"),
            F.split(
                F.coalesce(F.element_at(cmap, aid), F.lit(default_cats)), ","
            ).alias("catUrls"),
        )

    def act_assoc_struct(e: Column) -> Column:
        aid, typ, name, ordering = parts_of(e)
        return F.struct(
            aid.alias("id"), typ.alias("type"), name.alias("name"),
            ordering.alias("ordering"), F.lit("").alias("associatedDocid"),
            slugify(F.lower(name)).alias("url"),
        )

    def sec_parts(e: Column):
        p = F.split(e, r"\|")
        first, second = F.trim(_f(p, 1)), _f(p, 2)
        has_hash = F.instr(first, "#") > 0
        actid = F.trim(_f(F.split(first, "#"), 1))
        secid = F.trim(F.coalesce(_f(F.split(first, "#"), 2), F.lit("")))
        raw = F.coalesce(_f(F.split(second, r"\^"), 2), F.lit(""))
        # "Section - " prefix when the section starts with a digit (ts:1177)
        pref = F.when(
            (raw != "") & F.substring(raw, 1, 1).rlike("[0-9]"),
            F.concat(F.lit("Section - "), raw),
        ).otherwise(raw)
        name = F.trim(_f(F.split(pref, "~"), 1))
        ordering = F.coalesce(_f(F.split(pref, "~"), 2), F.lit(""))
        typ = F.lower(F.coalesce(_f(F.split(second, r"\^"), 1), F.lit("")))
        return has_hash, actid, secid, name, ordering, typ

    def sec_struct(e: Column) -> Column:
        has_hash, actid, secid, name, ordering, typ = sec_parts(e)
        hit = F.element_at(pmap, actid)
        # objSection is only filled when the act is popular (ts:1229-1239);
        # otherwise the reference pushes an EMPTY struct — kept
        filled = F.struct(
            secid.alias("id"), actid.alias("pid"),
            F.concat(actid, secid).alias("actsectionid"),
            typ.alias("type"), name.alias("name"),
            ordering.alias("ordering"),
            slugify(F.lower(name)).alias("url"),
        )
        empty = F.struct(
            F.lit("").alias("id"), F.lit("").alias("pid"),
            F.lit("").alias("actsectionid"), F.lit("").alias("type"),
            F.lit("").alias("name"), F.lit("").alias("ordering"),
            F.lit("").alias("url"),
        )
        return F.when(
            has_hash & (name != "") & hit.isNotNull(), filled
        ).when(has_hash & (name != ""), empty)

    def sec_assoc_struct(e: Column) -> Column:
        has_hash, actid, secid, name, ordering, typ = sec_parts(e)
        # parent-section override: LAST parentsectioninfo entry containing
        # the section id wins (ts:1184-1200)
        entries = F.split(pinfo, r"\$")
        matches = F.filter(
            entries, lambda pe: (secid != "") & (F.instr(pe, secid) > 0)
        )
        m = F.try_element_at(matches, F.lit(-1))
        sub = m.substr(F.instr(m, "#"), F.length(m))
        pparts = F.split(sub, r"\|")
        p0 = _f(pparts, 1)
        p1 = F.regexp_replace(_f(pparts, 2), r"\^", "-")
        par_id = F.trim(F.regexp_replace(p0, "#", " "))
        par_name = _f(F.split(p1, "~"), 1)
        par_ord = F.coalesce(_f(F.split(p1, "~"), 2), F.lit(""))
        use_parent = m.isNotNull()
        rid = F.when(use_parent, par_id).otherwise(secid)
        rname = F.when(use_parent, par_name).otherwise(name)
        rord = F.when(use_parent, par_ord).otherwise(ordering)
        return F.when(
            has_hash & (name != ""),
            F.struct(
                rid.alias("id"), typ.alias("type"), rname.alias("name"),
                rord.alias("ordering"),
                F.concat(actid, rid).alias("actsectionid"),
                actid.alias("associatedDocid"),
                slugify(F.lower(rname)).alias("url"),
            ),
        )

    acts = F.transform(act_elems, act_struct)
    sections_all = F.transform(sec_elems, sec_struct)
    sections = F.filter(sections_all, lambda s: s.isNotNull())
    sec_assocs = F.filter(
        F.transform(sec_elems, sec_assoc_struct), lambda s: s.isNotNull()
    )
    present = c.isNotNull() & (F.size(F.split(c, r"\$")) > 1)

    def when_present(arr: Column) -> Column:
        return F.when(present, arr).otherwise(F.slice(arr, 1, 0))

    return F.struct(
        when_present(acts).alias("acts"),
        when_present(F.transform(act_elems, act_assoc_struct)).alias(
            "actassociations"
        ),
        when_present(sections).alias("sections"),
        when_present(sec_assocs).alias("sectionassociations"),
        when_present(
            F.filter(
                F.transform(acts, lambda a: F.lower(F.trim(a["name"]))),
                lambda n: n != "",
            )
        ).alias("act_names"),
        when_present(
            F.filter(
                F.transform(sections, lambda s: F.lower(F.trim(s["name"]))),
                lambda n: n != "",
            )
        ).alias("section_names"),
    )


# --- taginfo (ts:2589-2613) ------------------------------------------------


def parse_taginfo(col: Column | str) -> Column:
    """TagInfo '$'-list, entries '|'-split into tags of ``id^name``;
    '0^0' placeholders excluded (ts:2601). Absent column → [{"",""}]."""
    c = _c(col)
    tags = F.flatten(
        F.transform(F.split(c, r"\$"), lambda t: F.split(t, r"\|"))
    )
    built = F.transform(
        F.filter(
            tags, lambda t: (t != "") & ~t.contains("0^0")
        ),
        lambda t: F.struct(
            F.coalesce(_f(F.split(t, r"\^"), 1), F.lit("")).alias("id"),
            F.coalesce(_f(F.split(t, r"\^"), 2), F.lit("")).alias("name"),
        ),
    )
    fallback = F.array(
        F.struct(F.lit("").alias("id"), F.lit("").alias("name"))
    )
    return F.when(c.isNotNull() & (c != ""), built).otherwise(fallback)


def parse_tagging_info(tagging_col: Column | str, allied_col: Column | str) -> Column:
    """ActRule TaggingInfo ('$'-list of ``x|id^name``) + AlliedInfo
    ('$'-list of ``id|name``) appended (ts:717-768)."""
    t = _c(tagging_col)
    a = _c(allied_col)
    t_built = F.transform(
        F.filter(F.split(t, r"\$"), lambda e: e != ""),
        lambda e: F.struct(
            F.coalesce(
                _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1), F.lit("")
            ).alias("id"),
            F.coalesce(
                _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
            ).alias("name"),
        ),
    )
    a_built = F.transform(
        F.filter(F.split(a, r"\$"), lambda e: F.trim(e) != ""),
        lambda e: F.struct(
            F.coalesce(_f(F.split(e, r"\|"), 1), F.lit("")).alias("id"),
            F.coalesce(_f(F.split(e, r"\|"), 2), F.lit("")).alias("name"),
        ),
    )
    empty = F.filter(t_built, lambda s: F.lit(False))
    return F.concat(
        F.when(t.isNotNull() & (t != ""), t_built).otherwise(empty),
        F.when(a.isNotNull() & (a != ""), a_built).otherwise(empty),
    )


# --- fullcontent processing (ts:2775-2848) ---------------------------------

_FOOTPRINT_RE = r"(?s)<div[^>]*class=['\"]footprint['\"][^>]*>.*?</div>"
_FOOTNOTE_RE = r"(?s)<footnote>.*?</footnote>"


def split_footnotes(content: Column | str, documentformat: Column | str) -> Column:
    """→ struct{body, footnotecontent}: ``.htm`` docs drop div.footprint
    subtrees; others strip ``<footnote>…</footnote>`` spans; extracted
    pieces concatenate into footnotecontent (ts:2780-2806)."""
    c = F.coalesce(_c(content), F.lit(""))
    fmt = F.lower(F.coalesce(_c(documentformat), F.lit("")))
    use_footprint = (fmt == ".htm") & c.rlike(_FOOTPRINT_RE)
    use_footnote = c.contains("<footnote>")
    body = F.when(
        use_footprint, F.regexp_replace(c, _FOOTPRINT_RE, "")
    ).when(
        use_footnote, F.regexp_replace(c, _FOOTNOTE_RE, "")
    ).otherwise(c)
    notes = F.when(
        use_footprint,
        F.array_join(F.regexp_extract_all(c, F.lit(_FOOTPRINT_RE), 0), ""),
    ).when(
        use_footnote,
        F.array_join(F.regexp_extract_all(c, F.lit(_FOOTNOTE_RE), 0), ""),
    ).otherwise(F.lit(""))
    return F.struct(body.alias("body"), notes.alias("footnotecontent"))


def finalize_fullcontent(body: Column, boost_text: Column) -> Column:
    """Header strip + metadata-div injection (ts:2812-2848): the
    searchboosttext rides inside the stored content in a display:none div
    before </document> / </html> / at the end."""
    stripped = F.when(
        body.contains("<header>"), removed_header_tag(body)
    ).otherwise(body)
    t = F.trim(stripped)

    def inject_before(tag: str, div_id: str) -> Column:
        # JS .replace replaces the FIRST occurrence of the close tag
        pos = F.instr(t, tag)
        div = F.concat(
            F.lit(f"<div id='{div_id}' style='display:none;'>"),
            boost_text, F.lit("</div>"),
        )
        return F.concat(
            t.substr(F.lit(1), pos - 1), div,
            t.substr(pos, F.length(t)),
        )

    div_no = F.concat(
        F.lit("<div id='nodata' style='display:none;'>"),
        boost_text, F.lit("</div>"),
    )
    return (
        F.when(t.contains("</document>"), inject_before("</document>", "xmlmetadata"))
        .when(t.contains("</html>"), inject_before("</html>", "htmmetadata"))
        .otherwise(F.concat(t, div_no))
    )


# --- the CaseLaws pipeline (ts:890-2955) -----------------------------------

CASE_LAWS_INPUT_COLUMNS = [
    "mid", "id", "excusdocid", "documenttype", "documentformat", "url",
    "year", "CaseSubject", "categoriescentax", "groups", "actassociations",
    "parentsectioninfo", "casereferred", "arinfo", "slpinfo", "DDA_CirNot",
    "MasterCitationOrder", "MasterCitationOrderCentax",
    "MasterCitationOrderCentaxElt", "MasterCitationOrderCentaxGstl",
    "MasterCitationOrderCentaxStr", "GSTSubjectID", "court", "bench",
    "benchtype", "InfavourofText", "ServiceInfo", "AAAAssociation",
    "citation", "fullcitation", "iltassociation", "TagInfo", "MarkingInfo",
    "hn1", "hn2", "hn3", "hn4", "hn5", "hn6", "hn7", "hn8", "hn9", "hn10",
    "HeadingSubheading", "partyname1", "partyname2", "appealno",
    "counselnameappellant", "counselnamerespondent", "judgename",
    "documentdate", "CrossTagging", "Heading", "subheading",
    "sortheading", "sortbycourt", "sortbyname", "sortbyauthor",
    "searchheadingnumber", "shortcontent", "fullcontent", "created_date",
    "UpdatedDate",
]


def case_laws_document(
    df: DataFrame, templateid: str = "", popular_variant: str = "case_final"
) -> DataFrame:
    """CaseLawsIndex re-expressed: one packed row → one nested
    IndexDocument row. Cites solrIndexCreation.ts:890-2955 throughout;
    field-by-field mapping in the inline comments. Narrow plan — zero
    shuffles; see module docstring."""
    # ADO.NET DataTable column addressing is case-insensitive — the
    # reference's dr["heading"] and dr["Heading"] are ONE column. Spark's
    # resolver is case-insensitive too, so accept either spelling but
    # never both.
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous; "
            "the reference treats them as one column"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, CASE_LAWS_INPUT_COLUMNS)
    heading_src = F.coalesce(F.col("Heading").cast("string"), F.lit(""))
    # Precompute BEFORE the aliasing select: outer column references inside
    # higher-order-function lambdas resolve laterally against sibling
    # select aliases (Spark 4.1 single-pass resolver), so a lambda that
    # reads col("id") inside the select would silently pick up the OUTPUT
    # alias id (= trimmed mid) instead of the input column.
    df = df.withColumn(
        "_casereferred",
        parse_casereferred(F.col("casereferred"), F.trim(_s("id"))),
    )

    # --- pieces reused across fields ---
    docdate_raw = _s("documentdate")
    docdate = F.when(
        _f(F.split(docdate_raw, r"\^"), 1) != "",
        _f(F.split(docdate_raw, r"\^"), 1),
    ).otherwise(F.lit("19000101"))
    docdate_disp = _f(F.split(docdate_raw, r"\^"), 2)
    sbt = remove_special_with_space(
        F.concat_ws(
            " ",
            F.lower(_s("categoriescentax")),
            F.lower(_s("groups")),
            F.lower(_s("fullcitation")),
            F.lower(_s("partyname1")),
            F.lower(_s("partyname2")),
            F.lit("appeal no"),
            F.lower(_s("appealno")),
            F.lower(string_only(_s("counselnameappellant"))),
            F.lower(string_only(_s("counselnamerespondent"))),
            F.lower(string_only(_s("judgename"))),
            F.lower(docdate_raw),
            F.lower(string_only(_s("court"))),
            F.lower(string_only(_s("bench"))),
            F.lower(string_only(_s("benchtype"))),
            F.lower(string_only(_s("InfavourofText"))),
            F.lower(string_only(_s("actassociations"))),
            F.trim(heading_src),
            F.trim(_s("subheading")),
        )
    )
    hn_cols = [F.col(f"hn{i}") for i in range(1, 11)]
    hn_text = headnotes_text(*hn_cols)
    assoc = parse_act_associations(
        F.col("actassociations"), F.col("parentsectioninfo"), popular_variant
    )
    gst = parse_gst_subjects(F.col("GSTSubjectID"), F.col("categoriescentax"))
    ilt = parse_iltinfo(F.col("iltassociation"))
    ilt_sug = ilt_suggest_inputs(ilt)
    aaa = parse_aaa_association(F.col("AAAAssociation"))
    marking = parse_marking_info(F.col("MarkingInfo").cast("string"))
    content = split_footnotes(F.col("fullcontent"), F.lower(_s("documentformat")))

    # subjects (ts:953-994): '$'-list of id|type^name~ordering, type 'subject'
    subj_elems = F.filter(
        F.split(F.col("CaseSubject"), r"\$"),
        lambda e: (F.size(F.split(e, r"\|")) > 1)
        & (
            F.trim(
                F.lower(
                    F.coalesce(
                        _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1),
                        F.lit(""),
                    )
                )
            )
            == "subject"
        )
        & (F.trim(_f(F.split(e, r"\|"), 1)) != ""),
    )
    subjects = F.when(
        F.col("CaseSubject").isNotNull()
        & (F.size(F.split(F.col("CaseSubject"), r"\$")) > 1),
        F.transform(
            subj_elems,
            lambda e: F.struct(
                F.trim(_f(F.split(e, r"\|"), 1)).alias("id"),
                F.lit("subject").alias("type"),
                F.coalesce(
                    _f(
                        F.split(
                            _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), "~"
                        ),
                        1,
                    ),
                    F.lit(""),
                ).alias("name"),
                F.lit("").alias("shortName"),
                F.coalesce(
                    _f(
                        F.split(
                            _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), "~"
                        ),
                        2,
                    ),
                    F.lit(""),
                ).alias("ordering"),
                slugify(
                    F.lower(
                        F.coalesce(
                            _f(
                                F.split(
                                    _f(
                                        F.split(
                                            _f(F.split(e, r"\|"), 2), r"\^"
                                        ),
                                        2,
                                    ),
                                    "~",
                                ),
                                1,
                            ),
                            F.lit(""),
                        )
                    )
                ).alias("url"),
            ),
        ),
    ).otherwise(
        F.filter(
            F.array(
                F.struct(
                    F.lit("").alias("id"), F.lit("").alias("type"),
                    F.lit("").alias("name"), F.lit("").alias("shortName"),
                    F.lit("").alias("ordering"), F.lit("").alias("url"),
                )
            ),
            lambda s: F.lit(False),
        )
    )
    subject_names = F.filter(
        F.transform(subjects, lambda s: F.lower(F.trim(s["name"]))),
        lambda n: n != "",
    )

    # HeadingSubheading suggest inputs, weight 16 (ts:2734-2751)
    headings_sug = F.filter(
        F.flatten(
            F.transform(
                F.filter(
                    F.split(F.col("HeadingSubheading"), r"\$"),
                    lambda e: F.instr(e, "|") > 0,
                ),
                lambda e: F.array(
                    F.lower(F.trim(_f(F.split(e, r"\|"), 1))),
                    F.lower(F.trim(_f(F.split(e, r"\|"), 2))),
                ),
            )
        ),
        lambda n: n.isNotNull() & (n != ""),
    )

    # GST classification names join the weight-16 subject pool (ts:2571-2576)
    class_names = F.filter(
        F.transform(
            gst["classification"], lambda s: F.trim(s["name"])
        ),
        lambda n: n != "",
    )
    subj16 = F.concat(class_names, ilt_sug["subjects"])

    # Suggest[] in reference emission order: subjects(18), acts(20,
    # one entry per act), sections(1), countries(8), articles(1),
    # classification+ilt subjects(16), headings(16). Court/bench/benchtype/
    # infavour entries are no-ops in the reference (inverted guards) — omitted.
    per_act = F.transform(
        F.filter(assoc["act_names"], lambda n: n != ""),
        lambda n: F.struct(
            F.array(n).alias("Input"), F.lit(20).alias("Weight")
        ),
    )
    suggest = F.filter(
        F.concat(
            F.array(_suggest(subject_names, 18)),
            per_act,
            F.array(
                _suggest(assoc["section_names"], 1),
                _suggest(ilt_sug["countries"], 8),
                _suggest(ilt_sug["articles"], 1),
                _suggest(subj16, 16),
                _suggest(headings_sug, 16),
            ),
        ),
        lambda s: s.isNotNull(),
    )

    sort_keys = citation_sort_keys()

    out = df.select(
        # identity (ts:917-947)
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.trim(_s("excusdocid")).alias("excusdocid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        F.when(
            F.trim(_s("year")) != "",
            F.struct(
                F.trim(_s("year")).alias("id"),
                F.trim(_s("year")).alias("name"),
            ),
        ).alias("year"),
        # categories: parse + whitelist, then the final 3-id filter with
        # 'centax ' strip (ts:997-1109, 2900-2916)
        filter_final_categories(
            parse_categories(F.col("categoriescentax"))
        ).alias("categories"),
        # groups 1-level struct (ts:1597-1618)
        F.when(
            F.col("groups").isNotNull() & (F.trim(_s("groups")) != ""),
            parse_groups(F.col("groups")),
        ).alias("groups"),
        # masterinfo (ts:1949-2178, 2182-2303, 2333-2583)
        F.struct(
            F.struct(
                gst["classification"].alias("classification"),
                gst["subclassification"].alias("subclassification"),
                subjects.alias("subject"),
                parse_court(F.col("court")).alias("court"),
                parse_bench(F.col("bench")).alias("bench"),
                parse_benchtype(F.col("benchtype")).alias("benchtype"),
                parse_infavourof(F.col("InfavourofText")).alias("infavourof"),
                parse_serviceinfo(F.col("ServiceInfo")).alias("services"),
                aaa["accountingstandard"].alias("accountingstandard"),
                aaa["indas"].alias("indas"),
                assoc["acts"].alias("act"),
                assoc["sections"].alias("section"),
            ).alias("info"),
            parse_citations(F.col("citation")).alias("citations"),
            ilt.alias("iltinfoes"),
        ).alias("masterinfo"),
        F.struct(
            F.transform(
                search_citation_names(F.col("citation")),
                lambda n: F.struct(n.alias("name")),
            ).alias("formattedcitation")
        ).alias("searchcitation"),
        F.struct(
            F.transform(
                search_ilt_citation(ilt), lambda n: F.struct(n.alias("name"))
            ).alias("formattediltcitation")
        ).alias("searchiltcitation"),
        # associates (ts:1113-1594)
        F.struct(
            assoc["actassociations"].alias("act"),
            assoc["sectionassociations"].alias("section"),
            F.col("_casereferred").alias("casereferred"),
            parse_arinfo_caselaw(F.col("arinfo")).alias("affirmreverse"),
            parse_slpinfo(F.col("slpinfo")).alias("slp"),
            parse_cirnot_assoc(F.col("DDA_CirNot")).alias("cirnot"),
        ).alias("associates"),
        # otherinfo: fullcitation + similarfullcitation (ts:2309-2332,5396+)
        F.struct(
            F.when(
                F.trim(_s("fullcitation")) != "",
                F.array(
                    F.struct(
                        F.lit("").alias("id"),
                        F.lit("fullcitation").alias("type"),
                        F.concat(
                            full_citation_name(F.col("fullcitation")),
                            F.lit(" ["),
                            F.coalesce(docdate_disp, F.lit("")),
                            F.lit("]"),
                        ).alias("name"),
                        F.lit("").alias("shortName"),
                    )
                ),
            ).otherwise(
                F.filter(
                    F.array(
                        F.struct(
                            F.lit("").alias("id"), F.lit("").alias("type"),
                            F.lit("").alias("name"), F.lit("").alias("shortName"),
                        )
                    ),
                    lambda s: F.lit(False),
                )
            ).alias("fullcitation"),
            F.transform(
                similar_full_citations(F.col("fullcitation")),
                lambda n: F.struct(
                    F.lit("").alias("id"),
                    F.lit("similarfullcitation").alias("type"),
                    n.alias("name"),
                    F.lit("").alias("shortName"),
                ),
            ).alias("similarfullcitation"),
        ).alias("otherinfo"),
        # tag / marking / headnotes (ts:2589-2717)
        parse_taginfo(F.col("TagInfo")).alias("taginfo"),
        marking.alias("markinginfo"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstoryheading"], F.lit("")
        ).alias("topstoryheading"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstorydesc"], F.lit("")
        ).alias("topstorydesc"),
        headnotes_array(*hn_cols).alias("headnotes"),
        # heading carries '[display date]' when dated (ts:1941)
        F.when(
            docdate != "19000101",
            F.concat(
                F.trim(heading_src), F.lit("["),
                F.coalesce(docdate_disp, F.lit("")), F.lit("]"),
            ),
        ).otherwise(F.trim(heading_src)).alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lower(F.trim(_s("sortbycourt"))).alias("sortbycourt"),
        F.lower(F.trim(_s("sortbyname"))).alias("sortbyname"),
        F.lower(F.trim(_s("sortbyauthor"))).alias("sortbyauthor"),
        *sort_keys.values(),
        sortheadingnumber_from_citations(F.col("citation")).alias(
            "sortheadingnumber"
        ),
        remove_special_with_space(
            F.lower(F.trim(_s("searchheadingnumber")))
        ).alias("searchheadingnumber"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lit("").alias("language"),
        # boost (ts:2722-2731), flags (ts:2895-2899)
        court_boost(F.col("court")).alias("documenttypeboost"),
        F.lit(1000).alias("boostpopularity"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        # dates (ts:1939-1940, 2852-2893; JS substring bug not replicated)
        docdate.alias("documentdate"),
        F.to_date(docdate, "yyyyMMdd").alias("formatteddocumentdate"),
        F.when(docdate != "19000101", docdate).otherwise(F.lit("")).alias(
            "displaydocumentdatestring"
        ),
        parse_docdate(F.col("created_date")).alias("created_date"),
        parse_docdate(F.col("UpdatedDate")).alias("updated_date"),
        # text fields (ts:2753-2772)
        sbt.alias("searchboosttext"),
        F.concat(hn_text, F.lit(" "), sbt).alias("headnotestext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        finalize_fullcontent(content["body"], sbt).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        tokenize_crosstagging(F.col("CrossTagging")).alias("wordphraseids"),
        suggest.alias("Suggest"),
    )
    return out


# --- the ActRule pipeline (ts:27-888) --------------------------------------

ACT_RULE_INPUT_COLUMNS = [
    "mid", "id", "documenttype", "documentformat", "filenamepath", "url",
    "year", "groups", "Heading", "subheading", "sortheading",
    "sortheadingnumber", "searchheadingnumber", "parentheading",
    "ActRuleSubject", "AAAAssociation", "TaggingInfo", "AlliedInfo",
    "categoriescentax", "masterinfo", "language", "shortcontent",
    "fullcontent", "documentdate", "created_date", "UpdatedDate",
]

# subgroup-id → year-suffix rule (ts:311-317)
_SUBGROUP_2019_IDS = (
    "111050000000010567", "111050000000017750", "111050000000017787"
)


def act_rule_document(
    df: DataFrame, doc_type: int = 1, templateid: str = ""
) -> DataFrame:
    """ActRuleIndex re-expressed (solrIndexCreation.ts:27-888):
    docType 1 = acts, 2 = rules (3+ = other statute-family docs).

    Same narrow-plan contract as ``case_laws_document``."""
    df = ensure_columns(df, ACT_RULE_INPUT_COLUMNS)
    heading_raw = _s("Heading")
    groups_raw = _s("groups")
    year = F.trim(_s("year"))

    # heading classification (ts:330-351)
    is_sched = F.lower(heading_raw).contains("schedule") | F.lower(
        heading_raw
    ).contains("appendix")
    numeric_lead = F.substring(F.trim(heading_raw), 1, 1).rlike("[0-9]")
    if doc_type == 1:
        classified = F.when(
            numeric_lead,
            F.when(
                groups_raw.contains("111050000000012773"),
                F.concat(F.lit("Article - "), heading_raw),
            ).otherwise(F.concat(F.lit("Section - "), heading_raw)),
        ).otherwise(heading_raw)
    elif doc_type == 2:
        classified = F.when(
            F.lower(groups_raw).contains("regulations"),
            F.concat(F.lit("Regulation - "), F.trim(heading_raw)),
        ).when(
            numeric_lead, F.concat(F.lit("Rule - "), F.trim(heading_raw))
        ).otherwise(F.trim(heading_raw))
        classified = strip_trailing_dot(F.trim(classified))
    else:
        classified = F.trim(heading_raw)
    heading = F.when(is_sched, F.trim(heading_raw)).otherwise(
        F.trim(classified)
    )

    # groups: 2-level with year-suffix quirks (ts:303-326)
    gparts = F.split(groups_raw, r"\|")
    g0, g1 = _f(gparts, 1), _f(gparts, 2)
    g0_id = F.trim(F.coalesce(_f(F.split(g0, r"\^"), 1), F.lit("")))
    g0_name = F.trim(F.coalesce(_f(F.split(g0, r"\^"), 2), F.lit("")))
    sg_id = F.trim(F.coalesce(_f(F.split(g1, r"\^"), 1), F.lit("")))
    sg_base = F.trim(F.coalesce(_f(F.split(g1, r"\^"), 2), F.lit("")))
    sg_name = (
        F.when(
            sg_id.isin(*_SUBGROUP_2019_IDS) & (year == "2019"),
            F.concat(sg_base, F.lit(", 2019")),
        )
        .when(
            (sg_id == _SUBGROUP_2019_IDS[0]) & (year == "2020"),
            F.concat(sg_base, F.lit(", 2020")),
        )
        .otherwise(sg_base)
    )
    grp_name = F.lit("form") if doc_type == 3 else g0_name
    groups = F.when(
        F.col("groups").isNotNull() & (groups_raw != ""),
        F.struct(
            F.struct(
                g0_id.alias("id"),
                grp_name.alias("name"),
                (F.lit("form") if doc_type == 3 else slugify(F.lower(g0_name))).alias("url"),
                F.struct(
                    sg_id.alias("id"),
                    sg_name.alias("name"),
                    slugify(F.lower(sg_name)).alias("url"),
                ).alias("subgroup"),
            ).alias("group")
        ),
    )

    # parentheadings (ts:357-402): docType 1 = single parent; docType 2 =
    # '$'-list of parent|subparent with the RuleNo suffix
    ph_raw = _s("parentheading")
    if doc_type == 1:
        # NB the reference guards this with ``!parentheading.replace("|^",
        # "")`` (ts:358) — inverted, so its docType-1 parents only populate
        # for effectively-empty input (a transpilation bug: the C# original
        # evidently meant IsNullOrEmpty). We use the evident intent:
        # populate when non-empty.
        php = F.split(ph_raw, r"\|")
        pname_raw = F.trim(F.regexp_replace(F.coalesce(_f(php, 2), F.lit("")), r"\^", " "))
        has_ord = F.instr(pname_raw, "#") > 0
        parents = F.when(
            F.regexp_replace(ph_raw, r"\|\^", "") != "",
            F.array(
                F.struct(
                    F.coalesce(_f(php, 1), F.lit("")).alias("id"),
                    F.when(
                        has_ord, _f(F.split(pname_raw, "#"), 1)
                    ).otherwise(pname_raw).alias("name"),
                    F.when(
                        has_ord,
                        F.coalesce(_f(F.split(pname_raw, "#"), 2), F.lit("")),
                    ).otherwise(F.lit("")).alias("ordering"),
                )
            ),
        )
    else:
        def parent_of(e: Column) -> Column:
            pc = F.split(e, r"\|")
            first, second = _f(pc, 1), _f(pc, 2)
            pid = F.trim(F.coalesce(_f(F.split(F.trim(first), r"\^"), 1), F.lit("")))
            pname_r = F.trim(F.coalesce(_f(F.split(first, r"\^"), 2), F.lit("")))
            has = F.instr(pname_r, "#") > 0
            pname = F.when(has, _f(F.split(pname_r, "#"), 1)).otherwise(pname_r)
            pord = F.when(
                has, F.coalesce(_f(F.split(pname_r, "#"), 2), F.lit(""))
            ).otherwise(F.lit(""))
            sp_id = F.trim(F.coalesce(_f(F.split(F.trim(second), r"\^"), 1), F.lit("")))
            sp_name = F.concat(
                F.trim(F.coalesce(_f(F.split(F.trim(second), r"\^"), 2), F.lit(""))),
                F.lit(" - RuleNo :"),
                F.trim(heading_raw),
            )
            return F.struct(
                pid.alias("id"), pname.alias("name"), pord.alias("ordering"),
                F.struct(
                    sp_id.alias("id"), sp_name.alias("name"),
                    pord.alias("ordering"),
                ).alias("subparentheading"),
            )

        built = F.transform(
            F.filter(F.split(ph_raw, r"\$"), lambda e: F.instr(e, "|") > 1),
            parent_of,
        )
        fallback = F.array(
            F.struct(
                F.lit("").alias("id"), F.lit("").alias("name"),
                F.lit("").alias("ordering"),
                F.struct(
                    F.lit("").alias("id"), F.lit("").alias("name"),
                    F.lit("").alias("ordering"),
                ).alias("subparentheading"),
            )
        )
        parents = F.when(
            F.col("parentheading").isNotNull() & (ph_raw != ""), built
        ).otherwise(fallback)
    # precompute: parent_of's lambda reads col("Heading"), which would
    # laterally resolve to the select's "heading" alias (see
    # case_laws_document note)
    df = df.withColumn("_parentheadings", parents)
    parents = F.col("_parentheadings")

    # subjects (ts:404-437) — same grammar as CaseSubject
    subj_elems = F.filter(
        F.split(F.col("ActRuleSubject"), r"\$"),
        lambda e: (F.size(F.split(e, r"\|")) > 1)
        & (
            F.trim(
                F.lower(
                    F.coalesce(
                        _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1),
                        F.lit(""),
                    )
                )
            )
            == "subject"
        )
        & (F.trim(_f(F.split(e, r"\|"), 1)) != ""),
    )
    subjects = F.transform(
        subj_elems,
        lambda e: F.struct(
            F.trim(_f(F.split(e, r"\|"), 1)).alias("id"),
            F.lit("subject").alias("type"),
            F.coalesce(
                _f(F.split(_f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), "~"), 1),
                F.lit(""),
            ).alias("name"),
            F.coalesce(
                _f(F.split(_f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), "~"), 2),
                F.lit(""),
            ).alias("ordering"),
        ),
    )
    subject_names = F.filter(
        F.transform(subjects, lambda s: F.lower(F.trim(s["name"]))),
        lambda n: n != "",
    )

    aaa = parse_aaa_association(F.col("AAAAssociation"))
    # ruleno master (ts:694-704): only for documenttype 'rule'
    is_rule = F.lower(F.trim(_s("documenttype"))) == "rule"
    ruleno = F.when(
        is_rule & (heading != ""),
        F.array(
            F.struct(
                heading.alias("name"),
                F.lower(F.regexp_replace(heading, " ", "")).alias("url"),
                F.lit(0).alias("orderInteger"),
                F.lit("ruleno").alias("type"),
            )
        ),
    )

    # searchboosttext (ts:772): requires groups AND a named parent heading
    parent0_name = F.coalesce(
        F.try_element_at(parents, F.lit(1))["name"], F.lit("")
    )
    sbt = F.when(
        groups.isNotNull() & (F.trim(parent0_name) != ""),
        remove_special_with_space(
            F.concat_ws(
                " ",
                F.lower(_s("categoriescentax")),
                grp_name,
                sg_name,
                year,
                string_only(F.lower(_s("masterinfo"))),
                F.trim(heading_raw),
                F.trim(_s("subheading")),
                F.trim(parent0_name),
            )
        ),
    )
    sbt_safe = F.coalesce(sbt, F.lit(""))

    # repealed-tag boost zeroing (ts:821-825) — exact full-string match
    tagging = _s("TaggingInfo")
    repealed = tagging.isin(
        "222210000000000002|TC1^Repealed Act",
        "222210000000000041|TC_Service_Tax_Repealed^Service Tax Repealed",
    )
    base_boost = {1: 10000, 2: 8000}.get(doc_type, 0)
    content = split_footnotes(F.col("fullcontent"), F.lower(_s("documentformat")))

    per_subject = F.when(
        F.size(subject_names) > 0,
        F.struct(subject_names.alias("Input"), F.lit(18).alias("Weight")),
    )
    sg_suggest = F.when(
        F.trim(sg_name) != "",
        F.struct(
            F.array(F.lower(F.trim(sg_name))).alias("Input"),
            F.lit(20).alias("Weight"),
        ),
    )
    heading_suggest = F.when(
        F.trim(heading) != "",
        F.struct(
            F.array(F.lower(F.trim(heading))).alias("Input"),
            F.lit(1).alias("Weight"),
        ),
    )
    suggest = F.filter(
        F.array(sg_suggest, per_subject, heading_suggest),
        lambda s: s.isNotNull(),
    )

    docdate = _s("documentdate")
    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("filenamepath")).alias("filenamepath"),
        F.when(
            year != "", F.struct(year.alias("id"), year.alias("name"))
        ).alias("year"),
        groups.alias("groups"),
        heading.alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lower(F.trim(_s("sortheadingnumber"))).alias("sortheadingnumber"),
        F.lower(F.trim(_s("searchheadingnumber"))).alias("searchheadingnumber"),
        parents.alias("parentheadings"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lower(F.trim(_s("language"))).alias("language"),
        filter_final_categories(
            parse_categories(F.col("categoriescentax"))
        ).alias("categories"),
        F.struct(
            F.struct(
                subjects.alias("subject"),
                aaa["accountingstandard"].alias("accountingstandard"),
                aaa["indas"].alias("indas"),
                ruleno.alias("ruleno"),
            ).alias("info")
        ).alias("masterinfo"),
        parse_tagging_info(F.col("TaggingInfo"), F.col("AlliedInfo")).alias(
            "taginfo"
        ),
        F.when(repealed, F.lit(0)).otherwise(F.lit(base_boost)).alias(
            "documenttypeboost"
        ),
        F.lit(1000).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        docdate.alias("documentdate"),
        F.to_date(
            F.when(docdate != "", docdate).otherwise(F.lit("19000101")),
            "yyyyMMdd",
        ).alias("formatteddocumentdate"),
        parse_docdate(F.col("created_date")).alias("created_date"),
        parse_docdate(F.col("UpdatedDate")).alias("updated_date"),
        sbt_safe.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        finalize_fullcontent(content["body"], sbt_safe).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        suggest.alias("Suggest"),
    )
    return out
