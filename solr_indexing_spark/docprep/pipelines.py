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

from ..plancache import plan_cached
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
from . import sidefiles
from .grammars import (
    COMPANY_CATEGORY_ID,
    FEMA_CATEGORY_ID,
    filter_final_categories,
    headnotes_array,
    headnotes_text,
    parse_arinfo,
    parse_categories,
    parse_groups,
    parse_marking_info,
    parse_marking_info_lower,
    parse_marking_info_lower_notrim,
    parse_marking_info_news,
    tokenize_crosstagging,
)
from .masterinfo import (
    ilt_suggest_inputs,
    parse_aaa_association,
    parse_aaa_standards,
    parse_aaa_standards_commentary,
    parse_authors,
    parse_iltinfo_article,
    parse_iltinfo_treaty,
    parse_arinfo_caselaw,
    parse_bench,
    parse_benchtype,
    parse_casereferred,
    parse_cirnot_assoc,
    parse_court,
    parse_gst_subjects,
    parse_iltinfo,
    parse_iltinfo_cirnot,
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
    missing = [c for c in cols if c not in present]
    if not missing:
        return df
    # ONE select, not a withColumn chain: every chained withColumn re-analyzes
    # the growing plan (a py4j round trip + Catalyst resolution each), which
    # measured as the dominant share of the ~20 s per-pipeline driver constant
    return df.select(
        "*", *[F.lit(None).cast("string").alias(c) for c in missing]
    )


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


@plan_cached("case_laws")
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
        F.try_to_date(docdate, "yyyyMMdd").alias("formatteddocumentdate"),
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


# --- shared: subject grammar ('$'-list, type=='subject') -------------------


def parse_subjects(col: Column | str, with_short: bool = True) -> Column:
    """CaseSubject / CirNotSubject / ActRuleSubject grammar
    (ts:953-994, 3986-4018, 404-437): '$'-list of
    ``id|subject^name~ordering``; only type 'subject' with non-empty id."""
    c = _c(col)
    elems = F.filter(
        F.split(c, r"\$"),
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

    def build(e: Column) -> Column:
        nameord = _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2)
        name = F.coalesce(_f(F.split(nameord, "~"), 1), F.lit(""))
        ordering = F.coalesce(_f(F.split(nameord, "~"), 2), F.lit(""))
        fields = [
            F.trim(_f(F.split(e, r"\|"), 1)).alias("id"),
            F.lit("subject").alias("type"),
            name.alias("name"),
        ]
        if with_short:
            fields.append(F.lit("").alias("shortName"))
        fields += [
            ordering.alias("ordering"),
            slugify(F.lower(name)).alias("url"),
        ]
        return F.struct(*fields)

    built = F.transform(elems, build)
    ok = c.isNotNull() & (F.size(F.split(c, r"\$")) > 1)
    return F.when(ok, built).otherwise(F.slice(built, 1, 0))


def subject_names_of(subjects: Column) -> Column:
    return F.filter(
        F.transform(subjects, lambda s: F.lower(F.trim(s["name"]))),
        lambda n: n != "",
    )


# --- the CirNot pipeline (ts:3803-4699) ------------------------------------

CIRNOT_INPUT_COLUMNS = [
    "mid", "id", "excusdocid", "documenttype", "documentformat", "url",
    "year", "categoriescentax", "groups", "Heading", "CirNotSubject",
    "ActAssociation", "parentsectioninfo", "arinfo", "DDA_Experts",
    "subheading", "sortheading", "sortheadingnumber", "searchheadingnumber",
    "language", "masterinfo", "iltinfo", "MarkingInfo", "TagInfo",
    "documentdate", "shortcontent", "fullcontent", "created_date",
    "UpdatedDate",
]

# group ids driving the boost + heading prefix (ts:4558-4567)
_CIRNOT_CIRCULAR_GROUP = "111050000000000113"
_CIRNOT_NOTIFICATION_GROUP = "111050000000000110"


def _cirnot_groups(col: Column | str, doc_type: int) -> Column:
    """CirNot groups (ts:3944-3964): '|'-split, group = part 1, subgroup =
    part 2 (0-based; part 0 is a prefix the reference ignores); each part
    'id^name'. docType 3 forces group name/url 'form'. A missing subgroup
    part leaves an empty subgroup (the reference's try/catch); a missing
    GROUP part crashes the reference's row (doc dropped) — here it yields
    empty strings (deviation: quarantine-by-crash not replicated)."""
    c = _c(col).cast("string")
    parts = F.split(c, r"\|")
    g = _f(parts, 2)
    sg = _f(parts, 3)
    g_id = F.trim(F.coalesce(_f(F.split(g, r"\^"), 1), F.lit("")))
    g_name = F.trim(F.coalesce(_f(F.split(g, r"\^"), 2), F.lit("")))
    sg_id = F.trim(F.coalesce(_f(F.split(sg, r"\^"), 1), F.lit("")))
    sg_name = F.trim(F.coalesce(_f(F.split(sg, r"\^"), 2), F.lit("")))
    sub = F.struct(
        sg_id.alias("id"),
        sg_name.alias("name"),
        F.when(sg_name != "", slugify(F.lower(sg_name))).otherwise(
            F.lit("")
        ).alias("url"),
    )
    name = F.lit("form") if doc_type == 3 else g_name
    url = (
        F.lit("form") if doc_type == 3 else slugify(F.lower(F.trim(g_name)))
    )
    return F.when(
        c.isNotNull(),
        F.struct(
            F.struct(
                g_id.alias("id"), name.alias("name"), url.alias("url"),
                sub.alias("subgroup"),
            ).alias("group")
        ),
    )


def _cirnot_taginfo(col: Column | str) -> Column:
    """CirNot TagInfo (ts:4528-4552): '$'-list; entry '|'-split, tag =
    part 1 as ``id^name``. No '0^0' exclusion (unlike CaseLaws). An entry
    WITHOUT '|' crashes the reference's row (doc dropped via the per-doc
    catch); here such entries are skipped (documented deviation)."""
    c = _c(col)
    built = F.transform(
        F.filter(F.split(c, r"\$"), lambda e: F.instr(e, "|") > 0),
        lambda e: F.struct(
            F.coalesce(
                _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1), F.lit("")
            ).alias("id"),
            F.coalesce(
                _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
            ).alias("name"),
        ),
    )
    return F.when(c.isNotNull() & (c != ""), built).otherwise(
        F.slice(built, 1, 0)
    )


def _cirnot_experts(col: Column | str) -> Column:
    """DDA_Experts (ts:4205-4222): '$'-list (needs >1 elements) of
    ``id|type^name^subheading``."""
    c = _c(col)
    elems = F.split(c, r"\$")
    built = F.transform(
        F.filter(elems, lambda e: F.size(F.split(e, r"\|")) > 1),
        lambda e: F.struct(
            F.trim(_f(F.split(e, r"\|"), 1)).alias("id"),
            F.lower(
                F.trim(
                    F.coalesce(
                        _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1),
                        F.lit(""),
                    )
                )
            ).alias("type"),
            F.trim(
                F.coalesce(
                    _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
                )
            ).alias("name"),
            F.trim(
                F.coalesce(
                    _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 3), F.lit("")
                )
            ).alias("subheading"),
        ),
    )
    ok = c.isNotNull() & (F.size(elems) > 1)
    return F.when(ok, built).otherwise(F.slice(built, 1, 0))


def finalize_fullcontent_chain(body: Column, boost_text: Column) -> Column:
    """CirNot-family content finalization (ts:4620-4622): unlike CaseLaws'
    first-match-only ladder, ALL THREE apply in sequence — replace the
    FIRST '</document>' (xmlmetadata div), then the FIRST '</html>'
    (htmmetadata div), then ALWAYS append the nodata div."""
    t = F.trim(body)

    def inject(t: Column, tag: str, div_id: str) -> Column:
        pos = F.instr(t, tag)
        div = F.concat(
            F.lit(f"<div id='{div_id}' style='display:none;'>"),
            boost_text, F.lit("</div>"),
        )
        return F.when(
            pos > 0,
            F.concat(t.substr(F.lit(1), pos - 1), div,
                     t.substr(pos, F.length(t))),
        ).otherwise(t)

    t = inject(t, "</document>", "xmlmetadata")
    t = inject(t, "</html>", "htmmetadata")
    return F.concat(
        t, F.lit("<div id='nodata' style='display:none;'>"), boost_text,
        F.lit("</div>"),
    )


@plan_cached("cirnot")
def cirnot_document(
    df: DataFrame, doc_type: int = 4, templateid: str = ""
) -> DataFrame:
    """CirNotIndex re-expressed (solrIndexCreation.ts:3803-4699) —
    circulars/notifications. Same narrow-plan contract as
    ``case_laws_document`` (one select, zero shuffles; popular-acts dim is
    a literal map).

    Faithful quirks kept: masterinfo.info (subject/act/section/cirnot/
    state/cirnotdoctype) and associates.affirmreverse only materialize when
    ActAssociation has >1 '$'-elements (ts:4023-4198 — without it
    masterinfo.info is null even though state parsed); cirnotdoctype is
    always empty (the reference's ``documentType`` local is never
    assigned); Suggest carries ONLY subject names (weight 18); the
    searchboosttext 'circular no'/'notification no' prefix and 3000/2500/
    1500 boost tiers key on group ids; the content chain injects all three
    metadata divs. Deviations (documented): year name uses the evident
    intent (chars 19-22) instead of the JS ``substring(18,4)`` arg-swap;
    S3 upload side effects are no-ops (S6); row-crash quirks (TagInfo
    without '|', groups without 2 '|'s) skip the element instead of
    dropping the whole doc."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, CIRNOT_INPUT_COLUMNS)
    heading_raw = _s("Heading")

    year = F.trim(_s("year"))
    year_struct = F.when(
        (year != "") & (year != "0000"),
        F.when(
            F.length(year) > 4,
            F.struct(
                F.trim(F.substring(year, 1, 18)).alias("id"),
                F.trim(F.substring(year, 19, 4)).alias("name"),
            ),
        ).otherwise(F.struct(year.alias("id"), year.alias("name"))),
    ).otherwise(
        F.struct(F.lit("").alias("id"), F.lit("").alias("name"))
    )

    subjects = parse_subjects(F.col("CirNotSubject"), with_short=True)
    assoc = parse_act_associations(
        F.col("ActAssociation"), F.col("parentsectioninfo"), "cirnot"
    )
    has_assoc = F.col("ActAssociation").isNotNull() & (
        F.size(F.split(_s("ActAssociation"), r"\$")) > 1
    )
    affirm = parse_arinfo(F.col("arinfo"))
    ilt = parse_iltinfo_cirnot(F.col("iltinfo"))
    marking = parse_marking_info_lower(F.col("MarkingInfo").cast("string"))
    content = split_footnotes(
        F.col("fullcontent"), F.lower(_s("documentformat"))
    )

    # state master from the packed 'masterinfo' column (ts:4239-4253)
    st = _s("masterinfo")
    stp = F.split(st, r"\|")
    st_name = F.coalesce(
        _f(F.split(_f(stp, 2), r"\^"), 2), F.lit("")
    )
    state = F.when(
        (st != "") & (F.length(st) > 5),
        F.array(
            F.struct(
                F.coalesce(_f(stp, 1), F.lit("")).alias("id"),
                F.coalesce(
                    _f(F.split(_f(stp, 2), r"\^"), 1), F.lit("")
                ).alias("type"),
                st_name.alias("name"),
                F.lit("").alias("shortName"),
                F.lower(st_name).alias("ordering"),
                slugify(F.lower(st_name)).alias("url"),
            )
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<id:string,type:string,name:string,"
            "shortName:string,ordering:string,url:string>>"
        )
    )

    # boost tier + searchboost heading prefix (ts:4556-4567)
    groups_raw = _s("groups")
    boost = (
        F.when(groups_raw.contains(_CIRNOT_CIRCULAR_GROUP), F.lit(3000))
        .when(groups_raw.contains(_CIRNOT_NOTIFICATION_GROUP), F.lit(2500))
        .otherwise(F.lit(1500))
    )
    cirnotnum = (
        F.when(
            groups_raw.contains(_CIRNOT_CIRCULAR_GROUP),
            F.concat(F.lit("circular no "), F.lower(heading_raw)),
        )
        .when(
            groups_raw.contains(_CIRNOT_NOTIFICATION_GROUP),
            F.concat(F.lit("notification no "), F.lower(heading_raw)),
        )
        .otherwise(F.lower(heading_raw))
    )
    sbt = remove_special_with_space(
        F.concat_ws(
            " ",
            F.lower(year), F.lower(string_only(st)),
            F.lower(_s("documentdate")), F.lower(_s("categoriescentax")),
            F.lower(groups_raw), cirnotnum, F.trim(_s("subheading")),
        )
    )

    per_subject = _suggest(subject_names_of(subjects), 18)
    suggest = F.filter(F.array(per_subject), lambda s: s.isNotNull())

    docdate = F.coalesce(
        _f(F.split(_s("documentdate"), r"\^"), 1), F.lit("")
    )

    info_struct = F.struct(
        subjects.alias("subject"),
        assoc["acts"].alias("act"),
        assoc["sections"].alias("section"),
        F.array(F.struct(F.trim(heading_raw).alias("name"))).alias("cirnot"),
        state.alias("state"),
        F.slice(state, 1, 0).alias("cirnotdoctype"),
    )

    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.trim(_s("excusdocid")).alias("excusdocid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        year_struct.alias("year"),
        filter_final_categories(
            parse_categories(F.col("categoriescentax"), whitelist=False)
        ).alias("categories"),
        _cirnot_groups(F.col("groups"), doc_type).alias("groups"),
        F.trim(heading_raw).alias("heading"),
        F.when(has_assoc, info_struct).alias("masterinfo_info"),
        ilt["trees"].alias("iltinfoes"),
        F.struct(
            F.transform(
                ilt["names"], lambda n: F.struct(n.alias("name"))
            ).alias("formattediltcitation")
        ).alias("searchiltcitation"),
        F.struct(
            F.when(has_assoc, assoc["actassociations"]).alias("act"),
            F.when(has_assoc, assoc["sectionassociations"]).alias("section"),
            F.when(has_assoc, affirm).alias("affirmreverse"),
            _cirnot_experts(F.col("DDA_Experts")).alias("expert"),
        ).alias("associates"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lower(F.trim(_s("sortheadingnumber"))).alias("sortheadingnumber"),
        remove_special_with_space(
            F.lower(F.trim(_s("searchheadingnumber")))
        ).alias("searchheadingnumber"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lower(F.trim(_s("language"))).alias("language"),
        marking.alias("markinginfo"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstoryheading"], F.lit("")
        ).alias("topstoryheading"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstorydesc"], F.lit("")
        ).alias("topstorydesc"),
        _cirnot_taginfo(F.col("TagInfo")).alias("taginfo"),
        boost.alias("documenttypeboost"),
        F.lit(1000).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        finalize_fullcontent_chain(
            F.when(
                _s("fullcontent").contains("<header>"),
                removed_header_tag(content["body"]),
            ).otherwise(content["body"]),
            sbt,
        ).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        docdate.alias("documentdate"),
        # try_to_date: an empty/garbled date is the reference's JS
        # Invalid Date (no crash), not an error
        F.try_to_date(docdate, "yyyyMMdd").alias("formatteddocumentdate"),
        F.when(F.trim(docdate) != "19000101", docdate).otherwise(
            F.lit("")
        ).alias("displaydocumentdatestring"),
        parse_docdate(F.col("created_date")).alias("created_date"),
        parse_docdate(F.col("UpdatedDate")).alias("updated_date"),
        suggest.alias("Suggest"),
    )
    # masterinfo nests info under the same shape as the other pipelines
    return out.withColumn(
        "masterinfo", F.struct(F.col("masterinfo_info").alias("info"))
    ).drop("masterinfo_info")


# --- the CaseLawsPartial pipeline (ts:2957-3192) ---------------------------

CASE_PARTIAL_INPUT_COLUMNS = [
    "mid", "id", "actassociations", "parentsectioninfo", "CaComparison",
]


def parse_ca_comparison(col: Column | str) -> Column:
    """CaComparison (ts:3121-3157): '$'-list (>1) of '|'-entries; the
    first '|'-part's '^'-fields 2/3 give the Companies Act 1956 section,
    and every '|'-part carrying the 2013-act id contributes a nested
    2013 section (names: first space → '-'). NB the reference builds this
    list and never attaches it to the document (dead code at ts:3154) —
    exposed here as its own column."""
    c = _c(col)
    elems = F.filter(
        F.split(c, r"\$"), lambda e: F.size(F.split(e, r"\|")) > 1
    )

    def dash_first_space(v: Column) -> Column:
        pos = F.instr(v, " ")
        return F.when(
            pos > 0,
            F.concat(
                v.substr(F.lit(1), pos - 1), F.lit("-"),
                v.substr(pos + 1, F.length(v)),
            ),
        ).otherwise(v)

    def sec2013(part: Column) -> Column:
        p = F.split(part, r"\^")
        name = dash_first_space(F.trim(F.coalesce(_f(p, 4), F.lit(""))))
        return F.when(
            part.contains("102010000000000793"),
            F.struct(
                F.trim(F.coalesce(_f(p, 3), F.lit(""))).alias("id"),
                name.alias("name"),
                F.lit("Companies Act, 2013").alias("actname"),
                slugify(F.lower(name)).alias("url"),
            ),
        )

    def build(e: Column) -> Column:
        first = F.coalesce(_f(F.split(e, r"\|"), 1), F.lit(""))
        p = F.split(first, r"\^")
        name = dash_first_space(F.trim(F.coalesce(_f(p, 4), F.lit(""))))
        return F.struct(
            F.trim(F.coalesce(_f(p, 3), F.lit(""))).alias("id"),
            name.alias("name"),
            F.lit("Companies Act, 1956").alias("actname"),
            slugify(F.lower(name)).alias("url"),
            F.filter(
                F.transform(F.split(e, r"\|"), sec2013),
                lambda s: s.isNotNull(),
            ).alias("ca2013section"),
        )

    ok = c.isNotNull() & (F.size(F.split(c, r"\$")) > 1)
    return F.when(ok, F.transform(elems, build))


@plan_cached("case_laws_partial")
def case_laws_partial_document(
    df: DataFrame, popular_variant: str = "case_final"
) -> DataFrame:
    """CaseLawsPartialIndex re-expressed (solrIndexCreation.ts:
    2957-3192) — the act/section partial-update document: id/mid +
    masterinfo.info{act,section} + associates{act,section} + the per-act
    weight-20 and pooled-section weight-1 Suggest entries. The
    CaComparison 1956→2013 mapping is parsed (its own column — dead code
    in the reference, see parse_ca_comparison)."""
    df = ensure_columns(df, CASE_PARTIAL_INPUT_COLUMNS)
    assoc = parse_act_associations(
        F.col("actassociations"), F.col("parentsectioninfo"), popular_variant
    )
    per_act = F.transform(
        F.filter(assoc["act_names"], lambda n: n != ""),
        lambda n: F.struct(
            F.array(n).alias("Input"), F.lit(20).alias("Weight")
        ),
    )
    suggest = F.filter(
        F.concat(per_act, F.array(_suggest(assoc["section_names"], 1))),
        lambda s: s.isNotNull(),
    )
    return df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.struct(
            F.struct(
                assoc["acts"].alias("act"),
                assoc["sections"].alias("section"),
            ).alias("info")
        ).alias("masterinfo"),
        F.struct(
            assoc["actassociations"].alias("act"),
            assoc["sectionassociations"].alias("section"),
        ).alias("associates"),
        parse_ca_comparison(F.col("CaComparison")).alias("ca_comparison"),
        suggest.alias("Suggest"),
    )


# --- the CaseFinder (digest) pipeline (ts:8408-9137) -----------------------

CASE_FINDER_INPUT_COLUMNS = [
    "mid", "id", "DTDInfo", "documentformat", "url", "year",
    "actassociations", "categoriescentax", "groups", "documentdate",
    "Heading", "subheading", "sortheading", "sortbycourt", "sortbyname",
    "sortbyauthor", "searchheadingnumber", "court", "bench", "benchtype",
    "InfavourofText", "citation", "fullcitation", "judgename",
    "counselnameappellant", "counselnamerespondent", "appealno", "asstyr",
    "partyname1", "partyname2", "shortcontent", "created_date",
]


def _digest_ilt(dtd0: Column) -> Column:
    """CaseFinder digest ilt grammar (ts:8945-9073): the '$'-parts of
    dtdinfo[0] carrying a '~'; fields '^'-split, each ``id~name``;
    country2/article/subject/subsubject fill only when the NAME is >15
    chars (else 18-zero ids); subject/subsubject pSubId from field 5;
    names pools for the searchboosttext. → struct{trees, names,
    countries, articles, subjects} (names gated on both country ids)."""
    ZERO = "000000000000000000"
    entries = F.filter(
        F.split(dtd0, r"\$"), lambda e: F.instr(e, "~") > 0
    )

    def build(e: Column) -> Column:
        f = F.split(e, r"\^")

        def part(i: int):
            seg = F.coalesce(_f(f, i), F.lit(""))
            return (
                F.coalesce(_f(F.split(seg, "~"), 1), F.lit("")),
                F.coalesce(_f(F.split(seg, "~"), 2), F.lit("")),
            )

        c1_id, c1_name = part(1)
        c2_id_raw, c2_name_raw = part(2)
        a_id_raw, a_name_raw = part(3)
        s_id_raw, s_name_raw = part(4)
        ss_id_raw, ss_name_raw = part(5)
        psub = F.coalesce(
            _f(F.split(F.coalesce(_f(f, 6), F.lit("")), "~"), 1), F.lit("")
        )

        def gi(
            id_: Column, pid: Column, psub_: Column, typ: str, name: Column,
            ordering: Column, url: Column,
        ) -> Column:
            return F.struct(
                id_.alias("id"), pid.alias("pid"), psub_.alias("pSubId"),
                F.lit(typ).alias("type"), name.alias("name"),
                F.lit("").alias("shortName"), ordering.alias("ordering"),
                F.lit(0).alias("orderInteger"), url.alias("url"),
            )

        country1 = gi(
            c1_id, F.lit(""), F.lit(""), "country1", c1_name,
            F.lower(c1_name), slugify(c1_name),
        )
        c2_ok = F.length(c2_name_raw) > 15
        c2_id = F.when(c2_ok, c2_id_raw).otherwise(F.lit(ZERO))
        country2 = F.when(
            c2_ok,
            gi(c2_id_raw, F.lit(""), F.lit(""), "country2", c2_name_raw,
               F.lower(c2_name_raw), slugify(c2_name_raw)),
        ).otherwise(
            gi(F.lit(ZERO), c1_id, F.lit(""), "country2", F.lit(""),
               F.lit(""), F.lit(""))
        )
        c12 = F.when(
            (c1_id != "") & (c2_id != ""), F.concat(c1_id, c2_id)
        ).otherwise(F.lit(""))
        a_ok = F.length(a_name_raw) > 15
        a_has = F.instr(a_name_raw, "#") > 0
        a_name = F.when(
            a_has, _f(F.split(a_name_raw, "#"), 1)
        ).otherwise(a_name_raw)
        a_ord = F.when(
            a_has, F.coalesce(_f(F.split(a_name_raw, "#"), 2), F.lit(""))
        ).otherwise(F.lit(""))
        article = F.when(
            a_ok,
            gi(a_id_raw, c12, F.lit(""), "article", a_name, a_ord,
               slugify(a_name)),
        ).otherwise(
            gi(F.lit(ZERO), c12, F.lit(""), "article", F.lit(""), F.lit(""),
               F.lit(""))
        )
        s_ok = F.length(s_name_raw) > 15
        subject = F.when(
            s_ok,
            gi(s_id_raw, c12, psub, "subject", s_name_raw,
               F.lower(s_name_raw), slugify(s_name_raw)),
        ).otherwise(
            gi(F.lit(ZERO), c12, F.lit(""), "subject", F.lit(""), F.lit(""),
               F.lit(""))
        )
        ss_ok = F.length(ss_name_raw) > 15
        subsubject = F.when(
            ss_ok,
            gi(ss_id_raw, c12, psub, "subsubject", ss_name_raw,
               F.lower(ss_name_raw), slugify(ss_name_raw)),
        ).otherwise(
            gi(F.lit(ZERO), c12, F.lit(""), "subsubject", F.lit(""),
               F.lit(""), F.lit(""))
        )
        return F.struct(
            country1.alias("country1"), country2.alias("country2"),
            article.alias("article"), subject.alias("subject"),
            subsubject.alias("subsubject"),
        )

    trees = F.transform(entries, build)
    names = F.filter(
        F.transform(
            trees,
            lambda t: F.when(
                (t["country1"]["id"] != "") & (t["country2"]["id"] != ""),
                F.concat(
                    t["country1"]["id"], t["country2"]["id"],
                    t["article"]["id"], t["subject"]["id"],
                    t["subsubject"]["id"],
                ),
            ),
        ),
        lambda n: n.isNotNull(),
    )

    def pool(parts: list[str]) -> Column:
        return F.flatten(
            F.transform(
                trees,
                lambda t: F.array(
                    *[F.trim(t[p]["name"]) for p in parts]
                ),
            )
        )

    return F.struct(
        trees.alias("trees"), names.alias("names"),
        pool(["country1", "country2"]).alias("countries"),
        pool(["article"]).alias("articles"),
        pool(["subject", "subsubject"]).alias("subjects"),
    )


@plan_cached("case_finder")
def case_finder_documents(
    df: DataFrame, templateid: str = ""
) -> DataFrame:
    """CaseFinderIndex re-expressed (solrIndexCreation.ts:8408-9137) —
    the digest fan-out: each case row EXPLODES into one document per
    '|'-entry of DTDInfo (documenttype 'digest', boost 0, caseid = the
    parent's mid; the digest id is the first '$'-part of the entry's
    '@'-field 0, tldheading/fullcontent from '@'-field 1).

    Faithful quirks kept: the popular-acts lookup calls hasOwnProperty on
    the FUNCTION object (ts:8468,8500 — always false), so every act
    resolves to 'Other Acts' and every section master stays an EMPTY
    struct; the digest ilt grammar keys on NAME length >15; heading
    always appends '[display-date]'; court/bench/benchtype are simplified
    single entries (benchtype needs a >12-char id); fullcitation replaces
    ALL '|' with '/'; sortheadingnumber is ''. The reference's elided
    citation block (ts:8764 '...') follows the CaseLaws grammar —
    parse_citations is reused. The one explode is the only fan-out; no
    shuffle (J3 at scale: explode keeps partition locality)."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, CASE_FINDER_INPUT_COLUMNS)
    df = df.filter(
        F.col("DTDInfo").isNotNull() & (F.trim(_s("DTDInfo")) != "")
    ).withColumn(
        "_digest", F.explode(F.split(F.col("DTDInfo"), r"\|"))
    ).filter(F.col("_digest") != "")

    dtd = F.split(F.col("_digest"), "@")
    dtd0 = F.coalesce(F.try_element_at(dtd, F.lit(1)), F.lit(""))
    dtd1 = F.coalesce(F.try_element_at(dtd, F.lit(2)), F.lit(""))
    digest_id = F.trim(
        F.coalesce(F.try_element_at(F.split(dtd0, r"\$"), F.lit(1)), F.lit(""))
    )
    ilt = _digest_ilt(dtd0)

    # acts: the broken hasOwnProperty → ALWAYS the Other-Acts row
    other_cats = ",".join(other_act_cat_urls("case_final"))
    aelems = F.filter(
        F.split(_s("actassociations"), r"\$"),
        lambda e: F.size(F.split(e, r"\|")) > 1,
    )

    def typ_of(e: Column) -> Column:
        return F.lower(
            F.coalesce(
                _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1), F.lit("")
            )
        )

    acts = F.transform(
        F.filter(aelems, lambda e: F.trim(typ_of(e)) == "act"),
        lambda e: F.struct(
            F.lit(OTHER_ACT_ID).alias("id"),
            typ_of(e).alias("type"),
            F.lit(OTHER_ACT_NAME).alias("name"),
            F.lit("").alias("shortName"),
            F.lit(OTHER_ACT_ORDERING).alias("ordering"),
            F.lit("other-acts").alias("url"),
            F.split(F.lit(other_cats), ",").alias("catUrls"),
        ),
    )

    def sec_ok(e: Column) -> Column:
        first = F.trim(_f(F.split(e, r"\|"), 1))
        raw = F.coalesce(
            _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
        )
        pref = F.when(
            (raw != "") & F.substring(raw, 1, 1).rlike("[0-9]"),
            F.concat(F.lit("Section - "), raw),
        ).otherwise(raw)
        name = F.trim(F.coalesce(_f(F.split(pref, "~"), 1), F.lit("")))
        return (
            (F.trim(typ_of(e)) != "act")
            & (F.instr(first, "#") > 0)
            & (F.coalesce(_f(F.split(first, "#"), 2), F.lit("")) != "")
            & (name != "")
        )

    empty_sec = F.struct(
        F.lit("").alias("id"), F.lit("").alias("pid"),
        F.lit("").alias("type"), F.lit("").alias("name"),
        F.lit("").alias("shortName"), F.lit("").alias("ordering"),
        F.lit("").alias("url"),
    )
    sections = F.transform(
        F.filter(aelems, sec_ok), lambda e: empty_sec
    )
    has_assoc = F.col("actassociations").isNotNull() & (
        F.size(F.split(_s("actassociations"), r"\$")) > 1
    )

    def simple_master(col_name: str, typ: str, min_id: int = 0) -> Column:
        c = _s(col_name)
        p = F.split(c, r"\^")
        cid = F.trim(F.coalesce(_f(p, 1), F.lit("")))
        name = F.trim(F.coalesce(_f(p, 3), F.lit("")))
        ok = (F.size(p) > 1) & (cid != "")
        if min_id:
            ok = ok & (F.length(cid) > min_id)
        return F.when(
            ok,
            F.array(
                F.struct(
                    cid.alias("id"), F.lit(typ).alias("type"),
                    F.trim(F.coalesce(_f(p, 2), F.lit(""))).alias(
                        "shortName"
                    ),
                    name.alias("name"), F.lit("").alias("ordering"),
                    slugify(F.lower(name)).alias("url"),
                )
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<id:string,type:string,shortName:string,"
                "name:string,ordering:string,url:string>>"
            )
        )

    infav = F.when(
        F.col("InfavourofText").isNotNull(),
        F.transform(
            F.split(_s("InfavourofText"), r"\|"),
            lambda e: F.struct(
                F.coalesce(_f(F.split(e, r"\^"), 1), F.lit("")).alias("id"),
                _f(F.split(e, r"\^"), 2).alias("name"),
                F.lit("").alias("shortName"),
                F.lit("infavourof").alias("type"),
            ),
        ),
    )

    g = parse_groups(F.col("groups"))
    groups = F.when(
        F.col("groups").isNotNull(),
        F.struct(
            F.struct(
                g["id"].alias("id"), g["name"].alias("name"),
                g["url"].alias("url"),
                F.struct(
                    F.lit("").alias("id"), F.lit("").alias("name"),
                    F.lit("").alias("url"),
                ).alias("subgroup"),
            ).alias("group")
        ),
    )

    def otherinfo_list(col_name: str, typ: str) -> Column:
        c = _s(col_name)
        return F.when(
            F.col(col_name).isNotNull(),
            F.transform(
                F.split(c, r"\|"),
                lambda e: F.struct(
                    F.coalesce(_f(F.split(e, r"\^"), 1), F.lit("")).alias(
                        "id"
                    ),
                    _f(F.split(e, r"\^"), 2).alias("name"),
                    F.lit("").alias("shortName"),
                    F.lit(typ).alias("type"),
                ),
            ),
        )

    appealnos = F.when(
        F.col("appealno").isNotNull(),
        F.transform(
            F.split(_s("appealno"), r"\|"),
            lambda e: F.struct(
                F.coalesce(
                    F.trim(_f(F.split(e, r"\^"), 1)), e
                ).alias("id"),
                F.coalesce(
                    F.trim(_f(F.split(e, r"\^"), 2)), e
                ).alias("name"),
                F.lit("").alias("shortName"),
                F.lit("appealno").alias("type"),
            ),
        ),
    )
    asstyrs = F.when(
        F.col("asstyr").isNotNull(),
        F.transform(
            F.filter(F.split(_s("asstyr"), r"\|"), lambda e: e != ""),
            lambda e: F.struct(
                e.alias("id"), e.alias("name"),
                F.lit("").alias("shortName"), F.lit("asstyr").alias("type"),
            ),
        ),
    )
    parties = F.filter(
        F.array(
            F.when(
                F.col("partyname1").isNotNull() & (_s("partyname1") != ""),
                F.struct(
                    F.lit("").alias("id"), _s("partyname1").alias("name"),
                    F.lit("").alias("shortName"),
                    F.lit("partyname1").alias("type"),
                ),
            ),
            F.when(
                F.col("partyname2").isNotNull() & (_s("partyname2") != ""),
                F.struct(
                    F.lit("").alias("id"), _s("partyname2").alias("name"),
                    F.lit("").alias("shortName"),
                    F.lit("partyname2").alias("type"),
                ),
            ),
        ),
        lambda s: s.isNotNull(),
    )
    _OI_DDL = (
        "array<struct<id:string,name:string,shortName:string,type:string>>"
    )
    empty_oi = F.array().cast(_OI_DDL)
    counsels = F.concat(
        F.coalesce(
            otherinfo_list("counselnameappellant", "counselnameappellant"),
            empty_oi,
        ),
        F.coalesce(
            otherinfo_list("counselnamerespondent", "counselnamerespondent"),
            empty_oi,
        ),
    )
    fullcit = F.when(
        F.col("fullcitation").isNotNull() & (_s("fullcitation") != ""),
        F.array(
            F.struct(
                F.lit("").alias("id"),
                F.regexp_replace(
                    F.trim(_s("fullcitation")), r"\|", "/"
                ).alias("name"),
                F.lit("").alias("shortName"),
                F.lit("fullcitation").alias("type"),
            )
        ),
    ).otherwise(
        F.filter(
            F.array(
                F.struct(
                    F.lit("").alias("id"), F.lit("").alias("name"),
                    F.lit("").alias("shortName"), F.lit("").alias("type"),
                )
            ),
            lambda s: F.lit(False),
        )
    )

    sbt = remove_special_with_space(
        F.concat_ws(
            " ",
            F.lower(_s("categoriescentax")), F.lower(_s("groups")),
            F.lower(_s("fullcitation")), F.lower(_s("partyname1")),
            F.lower(_s("partyname2")), F.lit("appeal no"),
            F.lower(_s("appealno")),
            F.lower(string_only(_s("counselnameappellant"))),
            F.lower(string_only(_s("counselnamerespondent"))),
            F.lower(string_only(_s("judgename"))),
            F.lower(_s("documentdate")),
            F.lower(string_only(_s("court"))),
            F.lower(string_only(_s("bench"))),
            F.lower(string_only(_s("benchtype"))),
            F.lower(string_only(_s("InfavourofText"))),
            F.lower(string_only(_s("actassociations"))),
            F.trim(_s("Heading")), F.trim(_s("subheading")),
            F.array_join(ilt["countries"], " "),
            F.array_join(ilt["articles"], " "),
            F.array_join(ilt["subjects"], " "),
        )
    )

    docdate = F.coalesce(
        _f(F.split(_s("documentdate"), r"\^"), 1), F.lit("")
    )
    docdate_disp = F.coalesce(
        _f(F.split(_s("documentdate"), r"\^"), 2), F.lit("")
    )
    year = F.trim(_s("year"))

    out = df.select(
        digest_id.alias("id"),
        digest_id.alias("mid"),
        F.lit(templateid).alias("templateid"),
        F.trim(_s("mid")).alias("caseid"),
        F.lit("digest").alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        F.when(
            year != "", F.struct(year.alias("id"), year.alias("name"))
        ).alias("year"),
        filter_final_categories(
            parse_categories(F.col("categoriescentax"))
        ).alias("categories"),
        groups.alias("groups"),
        docdate.alias("documentdate"),
        F.concat(
            F.trim(_s("Heading")), F.lit("["), docdate_disp, F.lit("]")
        ).alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lower(F.trim(_s("sortbycourt"))).alias("sortbycourt"),
        F.lower(F.trim(_s("sortbyname"))).alias("sortbyname"),
        F.lower(F.trim(_s("sortbyauthor"))).alias("sortbyauthor"),
        F.lit("").alias("sortheadingnumber"),
        F.lower(F.trim(_s("searchheadingnumber"))).alias(
            "searchheadingnumber"
        ),
        F.array(
            F.struct(
                F.lit("").alias("id"), F.lit("").alias("name"),
                F.lit("").alias("ordering"),
            )
        ).alias("parentheadings"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lit("").alias("language"),
        F.struct(
            F.struct(
                F.when(has_assoc, acts).alias("act"),
                F.when(has_assoc, sections).alias("section"),
                simple_master("court", "court").alias("court"),
                simple_master("bench", "bench").alias("bench"),
                simple_master("benchtype", "benchtype", min_id=12).alias(
                    "benchtype"
                ),
                infav.alias("infavourof"),
            ).alias("info"),
            parse_citations(F.col("citation")).alias("citations"),
            ilt["trees"].alias("iltinfoes"),
        ).alias("masterinfo"),
        F.struct(
            F.transform(
                search_citation_names(F.col("citation")),
                lambda n: F.struct(n.alias("name")),
            ).alias("formattedcitation")
        ).alias("searchcitation"),
        F.struct(
            F.transform(
                ilt["names"], lambda n: F.struct(n.alias("name"))
            ).alias("formattediltcitation")
        ).alias("searchiltcitation"),
        F.struct(
            fullcit.alias("fullcitation"),
            F.coalesce(
                otherinfo_list("judgename", "judge"),
                F.filter(fullcit, lambda s: F.lit(False)),
            ).alias("judge"),
            counsels.alias("counselname"),
            F.coalesce(
                asstyrs, F.filter(fullcit, lambda s: F.lit(False))
            ).alias("asstyr"),
            F.coalesce(
                appealnos, F.filter(fullcit, lambda s: F.lit(False))
            ).alias("appealno"),
            parties.alias("partyname"),
        ).alias("otherinfo"),
        F.lit(0).alias("documenttypeboost"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        F.coalesce(
            _f(F.split(dtd1, r"\^"), 2), F.lit("")
        ).alias("fullcontent"),
        F.coalesce(
            _f(F.split(dtd1, r"\^"), 1), F.lit("")
        ).alias("tldheading"),
        parse_docdate(F.col("created_date")).alias("created_date"),
        F.try_to_date(
            F.when(docdate != "", docdate).otherwise(F.lit("19000101")),
            "yyyyMMdd",
        ).cast("timestamp").alias("updated_date"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        F.lit(1000).alias("boostpopularity"),
    )
    return out


# --- the AAA pipelines (ts:7656-8064 / 9140-9400) --------------------------

AAA_INPUT_COLUMNS = [
    "mid", "id", "documenttype", "documentformat", "url",
    "CompareFileInfo", "year", "categoriescentax", "groups", "Heading",
    "subheading", "sortheadingnumber", "masterinfo", "AAAAssociation",
    "TagInfo", "paragraphinfo", "shortcontent", "fullcontent",
    "documentdate", "created_date", "UpdatedDate",
]

_AAA_INFO_DDL = (
    "struct<id:string,type:string,name:string,shortName:string,"
    "ordering:string,orderInteger:int,url:string>"
)


def _aaa_categories(col: Column | str) -> Column:
    """AAA simplified category grammar (ts:7714-7761): only the
    fema/company ids special-case (no competition/tp/ilt constants), NO
    whitelist, NO final filter."""
    c = _c(col).cast("string")
    elems = F.filter(F.split(c, r"\$"), lambda e: e != "")

    def seg_id(part: Column) -> Column:
        return F.trim(
            F.coalesce(_f(F.split(F.trim(part), r"\^"), 1), F.lit(""))
        )

    def seg_name(part: Column) -> Column:
        return F.coalesce(
            _f(
                F.split(
                    F.trim(F.coalesce(_f(F.split(part, r"\^"), 2), F.lit(""))),
                    "%",
                ),
                1,
            ),
            F.lit(""),
        )

    def parse_elem(e: Column) -> Column:
        isprim = F.coalesce(
            F.when(
                F.size(F.split(e, "%")) > 1,
                _f(F.split(e, "%"), 2).try_cast("int"),
            ),
            F.lit(0),
        )
        parts = F.split(e, r"\|")
        main = seg_id(_f(parts, 2))
        special = main.isin(FEMA_CATEGORY_ID, COMPANY_CATEGORY_ID)
        cat_id = F.when(special, seg_id(_f(parts, 2))).otherwise(
            seg_id(_f(parts, 1))
        )
        cat_name = F.when(special, seg_name(_f(parts, 2))).otherwise(
            seg_name(_f(parts, 1))
        )
        sub_id = F.when(special, seg_id(_f(parts, 3))).otherwise(
            seg_id(_f(parts, 2))
        )
        sub_name = F.when(special, seg_name(_f(parts, 3))).otherwise(
            seg_name(_f(parts, 2))
        )
        piped = F.instr(e, "|") > 1
        return F.when(
            piped,
            F.struct(
                cat_id.alias("id"), cat_name.alias("name"),
                slugify(F.lower(cat_name)).alias("url"),
                isprim.alias("isprimarycat"),
                F.struct(
                    sub_id.alias("id"), sub_name.alias("name"),
                    slugify(F.lower(sub_name)).alias("url"),
                ).alias("subcategory"),
            ),
        ).otherwise(
            F.struct(
                seg_id(e).alias("id"), seg_name(e).alias("name"),
                slugify(F.lower(seg_name(e))).alias("url"),
                isprim.alias("isprimarycat"),
                F.struct(
                    F.lit("").alias("id"), F.lit("").alias("name"),
                    F.lit("").alias("url"),
                ).alias("subcategory"),
            )
        )

    return F.transform(elems, parse_elem)


def _aaa_masterinfo(col: Column | str) -> Column:
    """AAA packed masterinfo (ts:7830-7878): '$'-entries
    ``id|type^name#ordering`` routed by type into industry / company /
    'account standard' / 'ind as' pools (AS/IndAS urls slug the
    pre-':' text)."""
    c = _c(col)
    elems = F.filter(F.split(c, r"\$"), lambda e: e != "")

    def pieces(e: Column):
        caret = F.split(e, r"\^")
        first = F.coalesce(_f(caret, 1), F.lit(""))
        blk = F.coalesce(_f(caret, 2), F.lit(""))
        mid0 = F.coalesce(_f(F.split(first, r"\|"), 1), F.lit(""))
        typ = F.lower(F.coalesce(_f(F.split(first, r"\|"), 2), F.lit("")))
        return mid0, typ, blk

    def pool(want: str, split_name: bool, colon_url: bool) -> Column:
        def build(e: Column) -> Column:
            mid0, typ, blk = pieces(e)
            has = F.instr(blk, "#") > 0
            name = (
                F.when(has, _f(F.split(blk, "#"), 1)).otherwise(blk)
                if split_name
                else F.coalesce(_f(F.split(blk, "#"), 1), F.lit(""))
            )
            ordering = F.when(
                has, F.coalesce(_f(F.split(blk, "#"), 2), F.lit(""))
            ).otherwise(F.lit(""))
            url_src = (
                F.when(
                    F.instr(blk, ":") > 0, _f(F.split(blk, ":"), 1)
                ).otherwise(name)
                if colon_url
                else name
            )
            return F.when(
                typ == want,
                F.struct(
                    mid0.alias("id"), typ.alias("type"),
                    name.alias("name"), F.lit("").alias("shortName"),
                    ordering.alias("ordering"),
                    F.lit(0).alias("orderInteger"),
                    slugify(url_src).alias("url"),
                ),
            )

        return F.filter(
            F.transform(elems, build), lambda s: s.isNotNull()
        )

    return F.struct(
        pool("industry", False, False).alias("industry"),
        pool("company", False, False).alias("company"),
        pool("account standard", True, True).alias("accountingstandard"),
        pool("ind as", True, True).alias("indas"),
    )


def _aaa_association(col: Column | str) -> Column:
    """AAA AAAAssociation (ts:7883-7916): ``id|type^name#order`` →
    accountingstandard / indas entries (types renamed; shortName = the
    pre-':' name text; orderInteger from '#')."""
    c = _c(col)
    elems = F.filter(F.split(c, r"\$"), lambda e: e != "")

    def build(e: Column, want: str, out_type: str) -> Column:
        caret = F.split(e, r"\^")
        first = F.coalesce(_f(caret, 1), F.lit(""))
        blk = F.coalesce(_f(caret, 2), F.lit(""))
        mid0 = F.trim(F.coalesce(_f(F.split(first, r"\|"), 1), F.lit("")))
        typ = F.lower(
            F.trim(F.coalesce(_f(F.split(first, r"\|"), 2), F.lit("")))
        )
        name = F.trim(F.coalesce(_f(F.split(blk, "#"), 1), F.lit("")))
        short = F.trim(F.coalesce(_f(F.split(name, ":"), 1), F.lit("")))
        return F.when(
            (typ == want) & (mid0 != ""),
            F.struct(
                mid0.alias("id"), F.lit(out_type).alias("type"),
                name.alias("name"), short.alias("shortName"),
                F.lower(short).alias("ordering"),
                F.coalesce(
                    F.trim(
                        F.coalesce(_f(F.split(blk, "#"), 2), F.lit(""))
                    ).try_cast("int"),
                    F.lit(0),
                ).alias("orderInteger"),
                slugify(F.lower(short)).alias("url"),
            ),
        )

    def pool(want: str, out_type: str) -> Column:
        return F.filter(
            F.transform(elems, lambda e: build(e, want, out_type)),
            lambda s: s.isNotNull(),
        )

    return F.struct(
        pool("account standard", "accountingstandard").alias(
            "accountingstandard"
        ),
        pool("ind as", "indas").alias("indas"),
    )


def _aaa_paragraphs(col: Column | str) -> Column:
    """paragraphinfo (ts:7953-7969): '$'-entries ``pid18cid|order@name``
    → {pid: first 18 chars, cid: rest, ordering int, name}."""
    c = _c(col)
    built = F.transform(
        F.filter(F.split(c, r"\$"), lambda e: e != ""),
        lambda e: F.struct(
            F.substring(
                F.coalesce(
                    _f(F.split(_f(F.split(e, "@"), 1), r"\|"), 1), F.lit("")
                ),
                1, 18,
            ).alias("pid"),
            F.substr(
                F.coalesce(
                    _f(F.split(_f(F.split(e, "@"), 1), r"\|"), 1), F.lit("")
                ),
                F.lit(19),
            ).alias("cid"),
            F.coalesce(
                F.trim(
                    F.coalesce(
                        _f(F.split(_f(F.split(e, "@"), 1), r"\|"), 2),
                        F.lit(""),
                    )
                ).try_cast("int"),
                F.lit(0),
            ).alias("ordering"),
            _f(F.split(e, "@"), 2).alias("name"),
        ),
    )
    return F.when(c.isNotNull() & (c != ""), built)


@plan_cached("aaa")
def aaa_document(df: DataFrame, templateid: str = "") -> DataFrame:
    """AAAIndex re-expressed (solrIndexCreation.ts:7656-8064) — audit /
    accounting / auditing standards content.

    Faithful quirks kept: boost 3000 when groups carry the 17331/11664
    markers else 950; the year field evaluates ``(!!dr['year'])
    .toString()`` — a BOOLEAN string, so every dated row gets
    {'true','true'} and undated rows {'false','e'} (ts:7702-7711, kept
    verbatim — deterministic transpilation bug); the simplified category
    grammar (no whitelist/final filter/constants); 5-level groups offset
    by one (levels 1-5 of the '|'-split, names un-'#'-split); sortheading
    ''; sortnumber only when sortheadingnumber parses under 2^31;
    masterinfo pools + AAAAssociation appended into accountingstandard/
    indas; documentdate RAW (no '^' split; formatted/updated dates read
    its 'yyyy-mm-dd' prefix). CompareFileInfo's side-file READ
    (ts:7689-7698) lives in sidefiles.attach_compare_file_content — the
    composer stays a linear map stage and emits the parsed
    ``comparefilepath`` join key plus the parse-level heading; the attach
    step broadcast-joins the side-file table, fills comparefilecontent,
    and nulls the heading for missing files (the reference assigns both
    only inside ``if (File.Exists)``)."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, AAA_INPUT_COLUMNS)
    groups_raw = _s("groups")

    minfo = _aaa_masterinfo(F.col("masterinfo"))
    assoc = _aaa_association(F.col("AAAAssociation"))
    has_m = F.col("masterinfo").isNotNull() & (F.length(_s("masterinfo")) > 0)
    has_a = F.col("AAAAssociation").isNotNull()

    def merged(pool_name: str) -> Column:
        base = F.when(has_m, minfo[pool_name]).otherwise(
            F.array().cast(f"array<{_AAA_INFO_DDL}>")
        )
        extra = F.when(has_a, assoc[pool_name]).otherwise(
            F.array().cast(f"array<{_AAA_INFO_DDL}>")
        )
        return F.concat(base, extra)

    # 5-level groups, offset one level (ts:7764-7807)
    gparts = F.split(groups_raw, r"\|")

    def glevel(i: int):
        seg = _f(gparts, i)
        idn = F.split(seg, r"\^")
        return (
            seg,
            F.trim(F.coalesce(_f(idn, 1), F.lit(""))),
            F.trim(F.coalesce(_f(idn, 2), F.lit(""))),
        )

    def e(ok: Column, v: Column) -> Column:
        return F.when(ok, v).otherwise(F.lit(""))

    _g1, g_id, g_name = glevel(2)
    s1, s1_id, s1_name = glevel(3)
    s2, s2_id, s2_name = glevel(4)
    s3, s3_id, s3_name = glevel(5)
    s4, s4_id, s4_name = glevel(6)
    oks = [
        seg.isNotNull() & (seg != "") for seg in (s1, s2, s3, s4)
    ]
    inner = F.struct(
        e(oks[3], s4_id).alias("id"), e(oks[3], s4_name).alias("name"),
        e(oks[3] & (s4_name != ""), slugify(F.lower(s4_name))).alias("url"),
    )
    lvl3 = F.struct(
        e(oks[2], s3_id).alias("id"), e(oks[2], s3_name).alias("name"),
        e(oks[2] & (s3_name != ""), slugify(F.lower(s3_name))).alias("url"),
        inner.alias("subsubsubsubgroup"),
    )
    lvl2 = F.struct(
        e(oks[1], s2_id).alias("id"), e(oks[1], s2_name).alias("name"),
        e(oks[1] & (s2_name != ""), slugify(F.lower(s2_name))).alias("url"),
        lvl3.alias("subsubsubgroup"),
    )
    lvl1 = F.struct(
        e(oks[0], s1_id).alias("id"), e(oks[0], s1_name).alias("name"),
        e(oks[0] & (s1_name != ""), slugify(F.lower(s1_name))).alias("url"),
        lvl2.alias("subsubgroup"),
    )
    groups = F.when(
        F.col("groups").isNotNull(),
        F.struct(
            F.struct(
                g_id.alias("id"), g_name.alias("name"),
                slugify(F.lower(g_name)).alias("url"),
                lvl1.alias("subgroup"),
            ).alias("group")
        ),
    )

    # the boolean-year quirk (ts:7702-7711) — kept verbatim
    year_struct = F.when(
        F.col("year").isNotNull() & (F.trim(_s("year")) != ""),
        F.struct(F.lit("true").alias("id"), F.lit("true").alias("name")),
    ).otherwise(
        F.struct(F.lit("false").alias("id"), F.lit("e").alias("name"))
    )

    shn = F.when(
        F.col("sortheadingnumber").isNotNull()
        & (_s("sortheadingnumber") != ""),
        F.lower(F.trim(_s("sortheadingnumber"))),
    ).otherwise(F.lit("0"))
    sortnumber = F.when(
        shn.try_cast("long") < 2147483647, shn.try_cast("int")
    )

    cfi = _s("CompareFileInfo")
    comparefileheading = F.when(
        F.col("CompareFileInfo").isNotNull() & (cfi != ""),
        F.coalesce(
            _f(F.split(_f(F.split(cfi, r"\|"), 2), r"\^"), 2), F.lit("")
        ),
    )

    sbt = remove_special_with_space(
        F.concat(
            F.lower(_s("categoriescentax")), F.lower(groups_raw),
            F.lower(string_only(_s("year"))),
            F.lower(string_only(_s("masterinfo"))),
            F.lower(string_only(_s("Heading"))),
            F.lower(_s("subheading")),
        )
    )
    content = split_footnotes(
        F.col("fullcontent"), F.lower(_s("documentformat"))
    )
    docdate = _s("documentdate")

    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        F.when(
            groups_raw.contains("111050000000017331")
            | groups_raw.contains("111050000000011664"),
            F.lit(3000),
        ).otherwise(F.lit(950)).alias("documenttypeboost"),
        comparefileheading.alias("comparefileheading"),
        F.lit(None).cast("string").alias("comparefilecontent"),
        # join key for the S5 side-file read (sidefiles.py): the parsed
        # relative attachment path; attach_compare_file_content fills
        # comparefilecontent and enforces the existence gate on heading
        sidefiles.compare_file_relpath(F.col("CompareFileInfo")).alias(
            "comparefilepath"
        ),
        year_struct.alias("year"),
        _aaa_categories(F.col("categoriescentax")).alias("categories"),
        groups.alias("groups"),
        F.col("Heading").cast("string").alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lit("").alias("sortheading"),
        shn.alias("sortheadingnumber"),
        sortnumber.alias("sortnumber"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lit("").alias("language"),
        F.struct(
            F.struct(
                F.when(has_m, minfo["company"]).otherwise(
                    F.array().cast(f"array<{_AAA_INFO_DDL}>")
                ).alias("company"),
                F.when(has_m, minfo["industry"]).otherwise(
                    F.array().cast(f"array<{_AAA_INFO_DDL}>")
                ).alias("industry"),
                merged("accountingstandard").alias("accountingstandard"),
                merged("indas").alias("indas"),
            ).alias("info")
        ).alias("masterinfo"),
        _cirnot_taginfo(F.col("TagInfo")).alias("taginfo"),
        _aaa_paragraphs(F.col("paragraphinfo")).alias("paragraphinfo"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        finalize_fullcontent(
            F.when(
                _s("fullcontent").contains("<header>"),
                removed_header_tag(content["body"]),
            ).otherwise(content["body"]),
            sbt,
        ).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        docdate.alias("documentdate"),
        # try_to_date: empty/garbled dates are JS Invalid Date, not errors
        F.try_to_date(F.substring(docdate, 1, 10)).alias(
            "formatteddocumentdate"
        ),
        # AAA created_date is an ISO-ish string: new Date(substr(0,19))
        # (ts:8032) — not the yyyymmddhhmmss shape of the other pipelines
        F.try_to_timestamp(
            F.regexp_replace(F.substring(_s("created_date"), 1, 19), "T", " ")
        ).alias("created_date"),
        F.try_to_date(F.substring(docdate, 1, 10)).cast("timestamp").alias(
            "updated_date"
        ),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        F.lit(1000).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
    )
    return out


AAA_MODEL_REPORT_INPUT_COLUMNS = [
    "mid", "id", "documenttype", "documentformat", "url", "fullcontent",
    "year", "categoriescentax", "groups", "Heading", "subheading",
    "associates", "AreaID", "ClauseID", "Opinion", "Topic",
    "documentdate", "created_date",
]


@plan_cached("aaa_model_report")
def aaa_model_report_document(
    df: DataFrame, templateid: str = ""
) -> DataFrame:
    """AAAModelReportIndex re-expressed (solrIndexCreation.ts:9140-9400)
    — model audit reports.

    Faithful quirks kept: fullcontent is '' unless the input contains a
    '<header>' (only the header-stripped branch assigns it); the
    side-file re-read (ts:9176-9183) is
    sidefiles.attach_model_report_content — a broadcast join on
    filenamepath that overrides fullcontent when the file exists, keeping
    this composer a linear map stage;
    year splits '^' into id/name; the AAA simplified category grammar;
    4-level '#'-ordering groups; sortheading '' and sortheadingnumber
    '0'; masterinfo pools (company/industry from 'associates', area/
    clause/opinions/topics from their packed columns, all gated on an
    18+-char id); formatted/created/updated dates are ALWAYS 1900-01-01
    (the reference's inverted ``!value`` guards, ts:9374-9377);
    boostpopularity 10."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, AAA_MODEL_REPORT_INPUT_COLUMNS)
    groups_raw = _s("groups")

    yp = F.split(_s("year"), r"\^")
    year_struct = F.when(
        F.col("year").isNotNull() & (_s("year") != ""),
        F.struct(
            F.trim(F.coalesce(_f(yp, 1), F.lit(""))).alias("id"),
            F.trim(F.coalesce(_f(yp, 2), F.lit(""))).alias("name"),
        ),
    ).otherwise(
        F.struct(F.lit("").alias("id"), F.lit("").alias("name"))
    )

    gparts = F.split(groups_raw, r"\|")

    def glevel(i: int):
        seg = _f(gparts, i)
        idn = F.split(seg, r"\^")
        lid = F.trim(F.coalesce(_f(idn, 1), F.lit("")))
        blk = F.coalesce(_f(idn, 2), F.lit(""))
        name = F.trim(F.coalesce(_f(F.split(blk, "#"), 1), F.lit("")))
        ordering = F.trim(F.coalesce(_f(F.split(blk, "#"), 2), F.lit("")))
        return seg, lid, name, ordering

    def e(ok: Column, v: Column) -> Column:
        return F.when(ok, v).otherwise(F.lit(""))

    _g, g_id, g_name, g_ord = glevel(1)
    sg, sg_id, sg_name, sg_ord = glevel(2)
    ss, ss_id, ss_name, ss_ord = glevel(3)
    sss, sss_id, sss_name, sss_ord = glevel(4)
    sg_ok = F.instr(F.coalesce(sg, F.lit("")), "^") > 0
    ss_ok = ss.isNotNull() & (ss != "")
    sss_ok = sss.isNotNull() & (sss != "")
    groups = F.when(
        F.col("groups").isNotNull(),
        F.struct(
            F.struct(
                g_id.alias("id"), g_name.alias("name"),
                g_ord.alias("ordering"),
                slugify(F.lower(g_name)).alias("url"),
                F.struct(
                    e(sg_ok, sg_id).alias("id"),
                    e(sg_ok, sg_name).alias("name"),
                    e(sg_ok, sg_ord).alias("ordering"),
                    e(sg_ok & (sg_name != ""), slugify(F.lower(sg_name))).alias("url"),
                    F.struct(
                        e(ss_ok, ss_id).alias("id"),
                        e(ss_ok, ss_name).alias("name"),
                        e(ss_ok, ss_ord).alias("ordering"),
                        e(ss_ok & (ss_name != ""), slugify(F.lower(ss_name))).alias("url"),
                        F.struct(
                            e(sss_ok, sss_id).alias("id"),
                            e(sss_ok, sss_name).alias("name"),
                            e(sss_ok, sss_ord).alias("ordering"),
                            e(
                                sss_ok & (sss_name != ""),
                                slugify(F.lower(sss_name)),
                            ).alias("url"),
                        ).alias("subsubsubgroup"),
                    ).alias("subsubgroup"),
                ).alias("subgroup"),
            ).alias("group")
        ),
    )

    def packed_single(col_name: str) -> Column:
        c = _s(col_name)
        p = F.split(c, r"\^")
        first = F.coalesce(_f(p, 1), F.lit(""))
        blk = F.coalesce(_f(p, 2), F.lit(""))
        name = F.coalesce(_f(F.split(blk, "#"), 1), F.lit(""))
        return F.when(
            F.col(col_name).isNotNull() & (F.length(first) > 15),
            F.array(
                F.struct(
                    first.alias("id"), name.alias("name"),
                    F.coalesce(
                        _f(F.split(blk, "#"), 2), F.lit("")
                    ).alias("ordering"),
                    slugify(name).alias("url"),
                )
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<id:string,name:string,ordering:string,"
                "url:string>>"
            )
        )

    # company/industry from 'associates' = 'industry|company' (ts:9301-9318)
    asc = F.split(_s("associates"), r"\|")

    def ci(i: int) -> Column:
        seg = F.coalesce(_f(asc, i), F.lit(""))
        sid = F.coalesce(_f(F.split(seg, r"\^"), 1), F.lit(""))
        name = F.coalesce(_f(F.split(seg, r"\^"), 2), F.lit(""))
        return F.when(
            F.col("associates").isNotNull() & (F.length(seg) > 15),
            F.array(
                F.struct(
                    sid.alias("id"), name.alias("name"),
                    F.lower(name).alias("ordering"),
                    slugify(name).alias("url"),
                )
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<id:string,name:string,ordering:string,"
                "url:string>>"
            )
        )

    sbt = remove_special_with_space(
        F.concat_ws(
            " ",
            F.lower(_s("categoriescentax")), F.lower(groups_raw),
            F.lower(string_only(_s("year"))),
            F.lower(string_only(_s("associates"))),
            F.lower(string_only(_s("AreaID"))),
            F.concat(
                F.lower(string_only(_s("ClauseID"))),
                F.lower(string_only(_s("Heading"))),
            ),
            F.lower(_s("subheading")),
        )
    )

    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        # only the header-strip branch assigns content (ts:9161-9174);
        # the side-file override happens in attach_model_report_content
        F.when(
            _s("fullcontent").contains("<header>"),
            removed_header_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        year_struct.alias("year"),
        _aaa_categories(F.col("categoriescentax")).alias("categories"),
        groups.alias("groups"),
        F.col("Heading").cast("string").alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lit("").alias("sortheading"),
        F.lit("0").alias("sortheadingnumber"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lit("").alias("language"),
        F.struct(
            F.struct(
                packed_single("AreaID").alias("area"),
                packed_single("ClauseID").alias("clause"),
                ci(2).alias("company"),
                ci(1).alias("industry"),
                packed_single("Opinion").alias("opinions"),
                packed_single("Topic").alias("topics"),
            ).alias("info")
        ).alias("masterinfo"),
        sbt.alias("searchboosttext"),
        F.lit("").alias("shortcontent"),
        F.coalesce(
            _f(F.split(_s("documentdate"), r"\^"), 1), F.lit("")
        ).alias("documentdate"),
        # inverted !-guards: always 1900-01-01 (ts:9374-9377)
        F.lit("1900-01-01").cast("date").alias("formatteddocumentdate"),
        F.lit("1900-01-01").cast("timestamp").alias("created_date"),
        F.lit("1900-01-01").cast("timestamp").alias("updated_date"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        F.lit(10).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
    )
    return out


# --- the Commentary pipelines (ts:6498-7148 / 7150-7654) -------------------

COMMENTARY_INPUT_COLUMNS = [
    "mid", "id", "documenttype", "documentformat", "url", "year",
    "OtherSubject", "DDA_Acts", "AAAAssociation", "DDA_Rules",
    "categoriescentax", "groups", "documentdate", "Heading", "subheading",
    "sortheading", "sortheadingnumber", "searchheadingnumber",
    "ParentFile", "parentidheading", "masterinfo", "shortcontent",
    "fullcontent", "MarkingInfo", "TagInfo", "created_date", "UpdatedDate",
]

_MODELS_DRAFTS = "111050000000000971^Models & Drafts"
_CHALLANS = "111050000000000972^Challans"
# subgroup / subsubsubgroup id-keyed name overrides (ts:6898-6906,
# 6920-6928)
_DTC_SUBGROUP_NAMES = {
    "111050000000000153": "DTC Bill, 2010",
    "111050000000017825": "DTC Bill, 2009",
    "111050000000017824": "DTC Reports",
}
_FINANCE_ACT_ID = "111050000000000108"
_SSS_NAMES = {
    "111050000000017782": "Finance (No. 2) Act, 2019",
    "111050000000017788": "Taxation Laws (Amendment) Act, 2019",
}


def _empty_group_levels(depth: int) -> Column:
    """Nested all-empty group levels so the form-branch struct matches
    the n-level `_commentary_groups` schema in a `when` chain."""
    names = ["subsubsubgroup", "subsubsubsubgroup"]
    inner: Column | None = None
    for name in reversed(names[:depth]):
        fields = [
            F.lit("").alias("id"), F.lit("").alias("name"),
            F.lit("").alias("ordering"), F.lit("").alias("url"),
        ]
        if inner is not None:
            fields.append(inner)
        inner = F.struct(*fields).alias(name)
    return inner


def _commentary_form_groups(col: Column | str, levels: int = 4) -> Column:
    """Models&Drafts / Challans special groups (ts:6852-6891): constant
    form group, subgroup = level 0, subsubgroup = level 1. Shaped to the
    same nested schema as ``_commentary_groups(levels=...)`` so the two
    sit in one ``when`` chain."""
    c = _c(col).cast("string")
    parts = F.split(c, r"\|")

    def level(i: int):
        seg = _f(parts, i)
        idn = F.split(seg, r"\^")
        blk = F.coalesce(_f(idn, 2), F.lit(""))
        return (
            seg,
            F.coalesce(_f(idn, 1), F.lit("")),
            F.trim(F.coalesce(_f(F.split(blk, "#"), 1), F.lit(""))),
            F.trim(F.coalesce(_f(F.split(blk, "#"), 2), F.lit(""))),
        )

    _s0, sg_id, sg_name, sg_ord = level(1)
    ss_seg, ss_id, ss_name, ss_ord = level(2)
    ss_ok = ss_seg.isNotNull() & (ss_seg != "")

    def e(ok: Column, v: Column) -> Column:
        return F.when(ok, v).otherwise(F.lit(""))

    return F.struct(
        F.struct(
            F.lit("111050000000000026").alias("id"),
            F.lit("form").alias("name"),
            F.lit("").alias("ordering"),
            F.lit("form").alias("url"),
            F.struct(
                sg_id.alias("id"), sg_name.alias("name"),
                sg_ord.alias("ordering"),
                slugify(sg_name).alias("url"),
                F.struct(
                    e(ss_ok, ss_id).alias("id"),
                    e(ss_ok, ss_name).alias("name"),
                    e(ss_ok, ss_ord).alias("ordering"),
                    e(ss_ok & (ss_name != ""), slugify(ss_name)).alias(
                        "url"
                    ),
                    _empty_group_levels(levels - 3),
                ).alias("subsubgroup"),
            ).alias("subgroup"),
        ).alias("group")
    )


def _commentary_groups(
    col: Column | str, year_name: Column, levels: int = 4
) -> Column:
    """Commentary n-level groups (ts:6893-6945 / Book 7393-7455): levels
    of ``id^name#ordering``; subgroup names override by DTC-bill id;
    subsubsubgroup names override for Finance/Taxation amendment acts
    (the Finance Act id resolves by the document's year)."""
    c = _c(col).cast("string")
    parts = F.split(c, r"\|")

    def level(i: int):
        seg = _f(parts, i)
        idn = F.split(seg, r"\^")
        lid = F.trim(F.coalesce(_f(idn, 1), F.lit("")))
        blk = F.coalesce(_f(idn, 2), F.lit(""))
        name = F.trim(F.coalesce(_f(F.split(blk, "#"), 1), F.lit("")))
        ordering = F.trim(F.coalesce(_f(F.split(blk, "#"), 2), F.lit("")))
        return seg, lid, name, ordering

    _g, g_id, g_name, g_ord = level(1)
    sg_seg, sg_id, sg_name_raw, sg_ord = level(2)
    ss_seg, ss_id, ss_name, ss_ord = level(3)
    sss_seg, sss_id, sss_name_raw, sss_ord = level(4)
    sg_ok = F.instr(F.coalesce(sg_seg, F.lit("")), "^") > 0
    ss_ok = ss_seg.isNotNull() & (ss_seg != "")
    sss_ok = sss_seg.isNotNull() & (sss_seg != "")

    sg_name = sg_name_raw
    for k, v in _DTC_SUBGROUP_NAMES.items():
        sg_name = F.when(sg_id == k, F.lit(v)).otherwise(sg_name)
    sss_name = (
        F.when(
            (sss_id == _FINANCE_ACT_ID) & (year_name == "2019"),
            F.lit("Finance Act, 2019"),
        )
        .when(
            (sss_id == _FINANCE_ACT_ID) & (year_name == "2020"),
            F.lit("Finance Act, 2020"),
        )
    )
    for k, v in _SSS_NAMES.items():
        sss_name = sss_name.when(sss_id == k, F.lit(v))
    sss_name = sss_name.otherwise(sss_name_raw)

    def e(ok: Column, v: Column) -> Column:
        return F.when(ok, v).otherwise(F.lit(""))

    inner: Column | None = None
    if levels >= 5:
        s4_seg, s4_id, s4_name, s4_ord = level(5)
        s4_ok = s4_seg.isNotNull() & (s4_seg != "")
        inner = F.struct(
            e(s4_ok, s4_id).alias("id"),
            e(s4_ok, s4_name).alias("name"),
            e(s4_ok, s4_ord).alias("ordering"),
            e(s4_ok & (s4_name != ""), slugify(F.lower(s4_name))).alias(
                "url"
            ),
        )
    sss_fields = [
        e(sss_ok, sss_id).alias("id"),
        e(sss_ok, sss_name).alias("name"),
        e(sss_ok, sss_ord).alias("ordering"),
        e(sss_ok & (sss_name != ""), slugify(F.lower(sss_name))).alias(
            "url"
        ),
    ]
    if inner is not None:
        sss_fields.append(inner.alias("subsubsubsubgroup"))
    sss = F.struct(*sss_fields)
    ss = F.struct(
        e(ss_ok, ss_id).alias("id"),
        e(ss_ok, ss_name).alias("name"),
        e(ss_ok, ss_ord).alias("ordering"),
        e(ss_ok & (ss_name != ""), slugify(F.lower(ss_name))).alias("url"),
        sss.alias("subsubsubgroup"),
    )
    sg = F.struct(
        e(sg_ok, sg_id).alias("id"),
        e(sg_ok, sg_name).alias("name"),
        e(sg_ok, sg_ord).alias("ordering"),
        e(sg_ok & (sg_name != ""), slugify(F.lower(sg_name))).alias("url"),
        ss.alias("subsubgroup"),
    )
    return F.struct(
        F.struct(
            g_id.alias("id"), g_name.alias("name"), g_ord.alias("ordering"),
            slugify(F.lower(g_name)).alias("url"),
            sg.alias("subgroup"),
        ).alias("group")
    )


def _commentary_acts(col: Column | str) -> Column:
    """Commentary DDA_Acts (ts:6583-6644) → struct{acts, sections,
    act_assocs, section_assocs}. No popular-acts dictionary; act ordering
    falls back to the lowercase name when no '~'. Faithful BUG kept: the
    reference pushes section ASSOCIATES into the ACT associate list
    (ts:6634), so associates.act mixes both and associates.section is
    always empty."""
    c = _c(col)
    elems = F.filter(
        F.split(c, r"\$"), lambda e: F.size(F.split(e, r"\|")) > 1
    )

    def typ_of(e: Column) -> Column:
        return F.lower(
            F.coalesce(
                _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1), F.lit("")
            )
        )

    def name_raw(e: Column) -> Column:
        return F.coalesce(
            _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
        )

    def act_master(e: Column) -> Column:
        raw = name_raw(e)
        name = F.coalesce(_f(F.split(raw, "~"), 1), F.lit(""))
        ordering = F.when(
            F.instr(raw, "~") > 0, _f(F.split(raw, "~"), 2)
        ).otherwise(F.lower(name))
        return F.struct(
            F.trim(_f(F.split(e, r"\|"), 1)).alias("id"),
            typ_of(e).alias("type"),
            name.alias("name"),
            F.lit("").alias("shortName"),
            ordering.alias("ordering"),
            slugify(F.lower(name)).alias("url"),
        )

    def act_assoc(e: Column) -> Column:
        raw = name_raw(e)
        name = F.coalesce(_f(F.split(raw, "~"), 1), F.lit(""))
        return F.struct(
            F.trim(_f(F.split(e, r"\|"), 1)).alias("id"),
            typ_of(e).alias("type"),
            name.alias("name"),
            F.lit("").alias("associatedDocid"),
            slugify(F.lower(name)).alias("url"),
        )

    def sec_pieces(e: Column):
        first = F.trim(_f(F.split(e, r"\|"), 1))
        pair = F.split(first, "#")
        raw = name_raw(e)
        pref = F.when(
            (raw != "") & F.substring(raw, 1, 1).rlike(r"[0-9\s]"),
            F.concat(F.lit("Section - "), raw),
        ).otherwise(raw)
        name = F.when(
            F.instr(pref, "~") > 0, _f(F.split(pref, "~"), 1)
        ).otherwise(pref)
        ordering = F.when(
            F.instr(pref, "~") > 0,
            F.coalesce(_f(F.split(pref, "~"), 2), F.lit("")),
        ).otherwise(F.lit(""))
        return first, pair, name, ordering

    def sec_master(e: Column) -> Column:
        first, pair, name, ordering = sec_pieces(e)
        return F.when(
            F.instr(first, "#") > 0,
            F.struct(
                F.coalesce(_f(pair, 2), F.lit("")).alias("id"),
                F.coalesce(_f(pair, 1), F.lit("")).alias("pid"),
                typ_of(e).alias("type"),
                name.alias("name"),
                F.lit("").alias("shortName"),
                ordering.alias("ordering"),
                slugify(F.lower(name)).alias("url"),
            ),
        )

    def sec_assoc(e: Column) -> Column:
        first, pair, name, ordering = sec_pieces(e)
        return F.when(
            F.instr(first, "#") > 0,
            F.struct(
                F.coalesce(_f(pair, 2), F.lit("")).alias("id"),
                typ_of(e).alias("type"),
                name.alias("name"),
                F.trim(_f(F.split(e, r"\|"), 1)).alias("associatedDocid"),
                slugify(F.lower(name)).alias("url"),
            ),
        )

    acts_e = F.filter(elems, lambda e: F.trim(typ_of(e)) == "act")
    secs_e = F.filter(elems, lambda e: F.trim(typ_of(e)) != "act")
    ok = c.isNotNull() & (F.size(F.split(c, r"\$")) > 1)
    acts = F.transform(acts_e, act_master)
    # the reference's act-associate list receives BOTH act associates and
    # section associates, in original element order (the act/section
    # branches push to the same list); emulate by rebuilding over all
    # elements
    mixed = F.filter(
        F.transform(
            elems,
            lambda e: F.when(
                F.trim(typ_of(e)) == "act", act_assoc(e)
            ).otherwise(sec_assoc(e)),
        ),
        lambda s: s.isNotNull(),
    )
    return F.struct(
        F.when(ok, acts).alias("acts"),
        F.when(
            ok,
            F.filter(
                F.transform(secs_e, sec_master), lambda s: s.isNotNull()
            ),
        ).alias("sections"),
        F.when(ok, mixed).alias("act_assocs"),
        F.when(ok, F.slice(mixed, 1, 0)).alias("section_assocs"),
    )


@plan_cached("commentary")
def commentary_document(df: DataFrame, templateid: str = "") -> DataFrame:
    """CommentaryIndex re-expressed (solrIndexCreation.ts:6498-7148).

    Faithful quirks kept: documenttype/boost keyed on group markers
    (Models&Drafts / Challans → 'form' + 7500; the ...084 group → boost
    1500 with documenttype left NULL; else column value + 900); the
    section associates land in associates.act while associates.section
    stays empty (ts:6634); associates.rule/ruleno only with a DDA_Rules
    list; AAA standards dedup first-wins; groups get the DTC/Finance-Act
    name overrides; parentheadings AND searchboosttext only materialize
    when parentidheading's first id is >15 chars — which INCLUDES the
    null-input default '000000000000000000|' (ts:6963-6964), so null
    input yields a blank parentheading + sbt ('Chapter ' prefix on
    direct-tax-code 2010 non-schedule parents); the fullcontent
    '||'-chain means only the '</document>' injection is reachable for
    non-empty content (ts:7028-7030) — '</html>' docs get NO metadata div;
    heading falls back to subheading, and the DTC-2010 'Section - '
    variant blanks it for non-numeric headings. Deviations: TagInfo
    '$'-entries parse every '|'-piece as ``id^name`` (name null without
    '^'); null TagInfo → one null tag; marking info uses the
    lowercased-text variant (ts:7054)."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, COMMENTARY_INPUT_COLUMNS)
    groups_raw = _s("groups")
    heading_raw = F.col("Heading").cast("string")
    year = F.trim(_s("year"))
    year_struct = F.when(
        (year != "") & (year != "0000"),
        F.struct(year.alias("id"), year.alias("name")),
    )

    doc_type_out = (
        F.when(
            groups_raw.contains(_MODELS_DRAFTS)
            | groups_raw.contains(_CHALLANS),
            F.lit("form"),
        )
        .when(
            groups_raw.contains("111050000000000084"),
            F.lit(None).cast("string"),
        )
        .otherwise(F.lower(F.trim(_s("documenttype"))))
    )
    boost = (
        F.when(
            groups_raw.contains(_MODELS_DRAFTS)
            | groups_raw.contains(_CHALLANS),
            F.lit(7500),
        )
        .when(groups_raw.contains("111050000000000084"), F.lit(1500))
        .otherwise(F.lit(900))
    )

    subjects = parse_subjects(F.col("OtherSubject"), with_short=True)
    has_subj = F.col("OtherSubject").isNotNull() & (
        F.size(F.split(_s("OtherSubject"), r"\$")) > 1
    )
    acts = _commentary_acts(F.col("DDA_Acts"))
    aaa = parse_aaa_standards_commentary(F.col("AAAAssociation"))
    rules = _article_rules(F.col("DDA_Rules"), pipe_filter=True)
    marking = parse_marking_info_lower_notrim(F.col("MarkingInfo").cast("string"))

    groups = F.when(
        groups_raw.contains(_MODELS_DRAFTS) | groups_raw.contains(_CHALLANS),
        _commentary_form_groups(F.col("groups")),
    ).when(
        F.col("groups").isNotNull(),
        _commentary_groups(F.col("groups"), year, levels=4),
    )

    # heading (ts:6951-6958)
    is_dtc2010 = groups_raw.contains("111050000000000153") & (year == "2010")
    numeric_lead = F.substring(
        F.coalesce(heading_raw, F.lit("")), 1, 1
    ).rlike("[1-9]")
    section_h = F.when(
        numeric_lead, F.concat(F.lit("Section - "), heading_raw)
    ).otherwise(F.lit(""))
    has_heading = heading_raw.isNotNull() & (heading_raw != "")
    heading = F.when(
        is_dtc2010,
        F.when(has_heading, section_h).otherwise(
            F.coalesce(_s("subheading"), F.lit(""))
        ),
    ).otherwise(
        F.when(
            has_heading & (F.trim(heading_raw) != ""),
            F.trim(heading_raw),
        ).otherwise(_s("subheading"))
    )
    subheading = F.when(has_heading, F.trim(_s("subheading"))).otherwise(
        F.lit("")
    )

    # parentheadings + gated searchboosttext (ts:6962-6983)
    has_file = F.when(
        F.lower(_s("ParentFile")).contains("fileyes"), F.lit("yes")
    ).otherwise(F.lit("no"))
    ptrim = F.regexp_replace(_s("parentidheading"), r"^\|+", "")
    parents_src = F.when(
        F.col("parentidheading").isNotNull(), ptrim
    ).otherwise(F.lit("000000000000000000|"))
    pparts = F.split(parents_src, r"\|")
    p0 = F.coalesce(_f(pparts, 1), F.lit(""))
    p0_id = F.coalesce(_f(F.split(p0, r"\^"), 1), F.lit(""))
    p_name_raw = F.trim(F.coalesce(_f(F.split(p0, r"\^"), 2), F.lit("")))
    p1 = _f(pparts, 2)
    p1_name_blk = F.coalesce(_f(F.split(p1, r"\^"), 2), F.lit(""))
    has_parent = F.length(p0_id) > 15
    sub_url = groups["group"]["subgroup"]["url"]
    chapterize = (
        F.coalesce(sub_url, F.lit("")).contains("direct-tax-code")
        & year.contains("2010")
        & ~F.lower(F.trim(p_name_raw)).contains("schedules")
    )
    p_name = F.when(
        chapterize,
        F.concat(F.lit("Chapter "), _f(F.split(p_name_raw, "#"), 1)),
    ).otherwise(F.coalesce(_f(F.split(p_name_raw, "#"), 1), F.lit("")))
    p_ord = F.when(
        F.size(F.split(p0, r"\^")) > 1,
        F.coalesce(_f(F.split(p_name_raw, "#"), 2), F.lit("")),
    ).otherwise(F.lit(""))
    parentheadings = F.when(
        has_parent,
        F.array(
            F.struct(
                F.trim(p0_id).alias("id"),
                p_name.alias("name"),
                p_ord.alias("ordering"),
                F.coalesce(p_ord.try_cast("int"), F.lit(0)).alias(
                    "orderInteger"
                ),
                has_file.alias("hasfile"),
                F.coalesce(
                    _f(F.split(p1, r"\^"), 1), F.lit("")
                ).alias("pid"),
                F.when(
                    p1.isNotNull() & (p1 != ""),
                    F.coalesce(
                        _f(F.split(p1_name_blk, "#"), 1), F.lit("")
                    ),
                ).otherwise(F.lit("")).alias("pname"),
            )
        ),
    )
    sbt = F.when(
        has_parent,
        remove_special_with_space(
            F.concat_ws(
                " ",
                F.lower(_s("categoriescentax")), F.lower(groups_raw),
                F.lower(year), string_only(F.lower(_s("masterinfo"))),
                heading, F.trim(p_name),
            )
        ),
    ).otherwise(F.lit(""))

    content = split_footnotes(
        F.col("fullcontent"), F.lower(_s("documentformat"))
    )
    body = F.when(
        _s("fullcontent").contains("<header>"),
        removed_header_tag(content["body"]),
    ).otherwise(content["body"])
    t = F.trim(body)
    # the '||'-chain quirk: non-empty content only ever gets the
    # '</document>' replacement (a no-op when absent); empty content gets
    # the nodata div (ts:7028-7030)
    doc_pos = F.instr(t, "</document>")
    injected = F.when(
        t == "",
        F.concat(
            F.lit("<div id='nodata' style='display:none;'>"), sbt,
            F.lit("</div>"),
        ),
    ).when(
        doc_pos > 0,
        F.concat(
            t.substr(F.lit(1), doc_pos - 1),
            F.lit("<div id='xmlmetadata' style='display:none;'>"), sbt,
            F.lit("</div>"),
            t.substr(doc_pos, F.length(t)),
        ),
    ).otherwise(t)

    taginfo = F.when(
        F.col("TagInfo").isNotNull() & (_s("TagInfo") != ""),
        F.filter(
            F.transform(
                F.flatten(
                    F.transform(
                        F.split(_s("TagInfo"), r"\$"),
                        lambda e: F.split(e, r"\|"),
                    )
                ),
                lambda tag: F.when(
                    tag != "",
                    F.struct(
                        F.coalesce(
                            _f(F.split(tag, r"\^"), 1), F.lit("")
                        ).alias("id"),
                        _f(F.split(tag, r"\^"), 2).alias("name"),
                    ),
                ),
            ),
            lambda s: s.isNotNull(),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("id"),
                F.lit(None).cast("string").alias("name"),
            )
        )
    )

    suggest = F.when(
        has_subj,
        F.transform(
            subject_names_of(subjects),
            lambda n: F.struct(
                F.array(n).alias("Input"), F.lit(18).alias("Weight")
            ),
        ),
    ).otherwise(
        F.array().cast("array<struct<Input:array<string>,Weight:int>>")
    )

    docdate = F.coalesce(
        _f(F.split(_s("documentdate"), r"\^"), 1), F.lit("")
    )
    created = _s("created_date")

    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.lit(templateid).alias("templateid"),
        doc_type_out.alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        year_struct.alias("year"),
        filter_final_categories(
            parse_categories(F.col("categoriescentax"))
        ).alias("categories"),
        groups.alias("groups"),
        docdate.alias("documentdate"),
        F.try_to_date(
            F.when(docdate != "", docdate).otherwise(F.lit("19000101")),
            "yyyyMMdd",
        ).alias("formatteddocumentdate"),
        heading.alias("heading"),
        subheading.alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lower(F.trim(_s("sortheadingnumber"))).alias("sortheadingnumber"),
        F.lower(F.trim(_s("searchheadingnumber"))).alias(
            "searchheadingnumber"
        ),
        parentheadings.alias("parentheadings"),
        F.struct(
            F.struct(
                F.when(has_subj, subjects).alias("subject"),
                acts["acts"].alias("act"),
                acts["sections"].alias("section"),
                aaa["standards"].alias("standards"),
                aaa["substandards"].alias("substandards"),
            ).alias("info")
        ).alias("masterinfo"),
        F.struct(
            acts["act_assocs"].alias("act"),
            acts["section_assocs"].alias("section"),
            rules["rule"].alias("rule"),
            rules["ruleno"].alias("ruleno"),
        ).alias("associates"),
        boost.alias("documenttypeboost"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        injected.alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lit("").alias("language"),
        marking.alias("markinginfo"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstoryheading"], F.lit("")
        ).alias("topstoryheading"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstorydesc"], F.lit("")
        ).alias("topstorydesc"),
        taginfo.alias("taginfo"),
        suggest.alias("Suggest"),
        F.when(
            F.length(created) > 12, parse_docdate(F.col("created_date"))
        ).otherwise(F.lit("1900-01-01").cast("timestamp")).alias(
            "created_date"
        ),
        F.coalesce(
            parse_docdate(F.col("UpdatedDate")),
            F.lit("1900-01-01").cast("timestamp"),
        ).alias("updated_date"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        F.lit(1000).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
    )
    return out


COMMENTARY_BOOK_INPUT_COLUMNS = [
    "mid", "id", "documenttype", "documentformat", "filenamepath", "url",
    "year", "masterinfo", "categoriescentax", "groups", "documentdate",
    "Heading", "subheading", "sortheading", "sortheadingnumber",
    "searchheadingnumber", "ParentFile", "parentidheading", "language",
    "shortcontent", "fullcontent", "MarkingInfo", "TagInfo",
]


@plan_cached("commentary_book")
def commentary_book_document(
    df: DataFrame, templateid: str = ""
) -> DataFrame:
    """CommentaryBookIndex re-expressed (solrIndexCreation.ts:7150-7654)
    — e-book reader chapters (boost 20).

    Faithful quirks kept: the packed 'masterinfo' ('|' 3 fields, >1) →
    prodid/dateofpublication/booktype singletons; categories use the 9-id
    whitelist but NO final 3-id filter; groups go FIVE levels with the
    same DTC/Finance overrides; heading rules key on group markers 17984
    (with parentidheading → 'Section - ' on digit lead) and 17981
    (without parentidheading, non-.pdf → 'Regulation - '/'Rule - ');
    parentheadings/searchboosttext gated as in Commentary; the content
    injection ladder keys on the ORIGINAL content but replaces in the
    header-stripped text; created/updated dates are never set (absent in
    the reference). Deviation: the reference's footnotecontent stringifies
    a DOM fragment ('[object DocumentFragment]') — we emit the joined
    footnote markup (the evident intent)."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, COMMENTARY_BOOK_INPUT_COLUMNS)
    groups_raw = _s("groups")
    heading_raw = F.col("Heading").cast("string")
    year = F.trim(_s("year"))
    has_heading = heading_raw.isNotNull() & (heading_raw != "")

    m = _s("masterinfo")
    mp = F.split(m, r"\|")
    has_m = F.col("masterinfo").isNotNull() & (F.size(mp) > 1)

    def m_single(i: int, typ: str) -> Column:
        v = F.coalesce(_f(mp, i), F.lit(""))
        return F.when(
            has_m,
            F.array(
                F.struct(
                    v.alias("id"), F.lit(typ).alias("type"),
                    v.alias("name"), v.alias("shortName"),
                    F.lower(v).alias("ordering"),
                    F.lit(0).alias("orderInteger"),
                    slugify(F.lower(v)).alias("url"),
                )
            ),
        )

    groups = F.when(
        groups_raw.contains(_MODELS_DRAFTS) | groups_raw.contains(_CHALLANS),
        _commentary_form_groups(F.col("groups"), levels=5),
    ).when(
        F.col("groups").isNotNull(),
        _commentary_groups(F.col("groups"), year, levels=5),
    )

    numeric_lead = F.substring(
        F.coalesce(heading_raw, F.lit("")), 1, 1
    ).rlike("[0-9]")
    heading = (
        F.when(
            groups_raw.contains("111050000000017984")
            & F.col("parentidheading").isNotNull()
            & (_s("parentidheading") != ""),
            F.when(
                has_heading & numeric_lead,
                F.concat(F.lit("Section - "), heading_raw),
            ).otherwise(heading_raw),
        )
        .when(
            groups_raw.contains("111050000000017981")
            & (F.col("parentidheading").isNull() | (_s("parentidheading") == ""))
            & (F.lower(F.trim(_s("documentformat"))) != ".pdf"),
            F.when(
                F.lower(groups_raw).contains("regulations"),
                F.concat(F.lit("Regulation - "), heading_raw),
            ).when(
                has_heading & numeric_lead,
                F.concat(F.lit("Rule - "), heading_raw),
            ).otherwise(heading_raw),
        )
        .otherwise(
            F.when(has_heading, heading_raw).otherwise(_s("subheading"))
        )
    )
    subheading = F.when(has_heading, F.trim(_s("subheading"))).otherwise(
        F.lit("")
    )

    # parentheadings + gated searchboosttext (ts:7488-7512) — same shape
    # as Commentary
    has_file = F.when(
        F.lower(_s("ParentFile")).contains("fileyes"), F.lit("yes")
    ).otherwise(F.lit("no"))
    ptrim = F.regexp_replace(_s("parentidheading"), r"^\|+", "")
    parents_src = F.when(
        F.col("parentidheading").isNotNull() & (_s("parentidheading") != ""),
        ptrim,
    ).otherwise(F.lit("000000000000000000|"))
    pparts = F.split(parents_src, r"\|")
    p0 = F.coalesce(_f(pparts, 1), F.lit(""))
    p0_id = F.coalesce(_f(F.split(p0, r"\^"), 1), F.lit(""))
    p_name_raw = F.when(
        F.size(F.split(p0, r"\^")) > 1,
        F.trim(F.coalesce(_f(F.split(p0, r"\^"), 2), F.lit(""))),
    ).otherwise(F.lit(""))
    p1 = _f(pparts, 2)
    p1_name_blk = F.coalesce(_f(F.split(p1, r"\^"), 2), F.lit(""))
    has_parent = F.length(p0_id) > 15
    sub_url = groups["group"]["subgroup"]["url"]
    chapterize = (
        F.coalesce(sub_url, F.lit("")).contains("direct-tax-code")
        & year.contains("2010")
        & ~F.lower(F.trim(p_name_raw)).contains("schedules")
    )
    p_name = F.when(
        chapterize,
        F.concat(F.lit("Chapter "), _f(F.split(p_name_raw, "#"), 1)),
    ).otherwise(F.coalesce(_f(F.split(p_name_raw, "#"), 1), F.lit("")))
    p_ord = F.when(
        F.size(F.split(p0, r"\^")) > 1,
        F.coalesce(_f(F.split(p_name_raw, "#"), 2), F.lit("")),
    ).otherwise(F.lit(""))
    parentheadings = F.when(
        has_parent,
        F.array(
            F.struct(
                F.trim(p0_id).alias("id"),
                p_name.alias("name"),
                p_ord.alias("ordering"),
                F.coalesce(p_ord.try_cast("int"), F.lit(0)).alias(
                    "orderInteger"
                ),
                has_file.alias("hasfile"),
                F.coalesce(_f(F.split(p1, r"\^"), 1), F.lit("")).alias(
                    "pid"
                ),
                F.when(
                    p1.isNotNull() & (p1 != ""),
                    F.coalesce(_f(F.split(p1_name_blk, "#"), 1), F.lit("")),
                ).otherwise(F.lit("")).alias("pname"),
            )
        ),
    )
    sbt = F.when(
        has_parent,
        remove_special_with_space(
            F.concat_ws(
                " ",
                F.lower(_s("categoriescentax")), F.lower(groups_raw),
                F.lower(year), string_only(F.lower(m)),
                heading, F.trim(p_name),
            )
        ),
    ).otherwise(F.lit(""))

    content = split_footnotes(
        F.col("fullcontent"), F.lower(_s("documentformat"))
    )
    stripped = F.when(
        _s("fullcontent").contains("<header>"),
        removed_header_tag(_s("fullcontent")),
    ).otherwise(_s("fullcontent"))
    # ladder keyed on the ORIGINAL content, replacement in the stripped
    orig = _s("fullcontent")

    def inject(text: Column, tag: str, div_id: str) -> Column:
        pos = F.instr(text, tag)
        div = F.concat(
            F.lit(f"<div id='{div_id}' style='display:none;'>"), sbt,
            F.lit("</div>"),
        )
        return F.when(
            pos > 0,
            F.concat(
                text.substr(F.lit(1), pos - 1), div,
                text.substr(pos, F.length(text)),
            ),
        ).otherwise(text)

    fullcontent = (
        F.when(
            F.instr(F.trim(orig), "</document>") > 0,
            inject(stripped, "</document>", "xmlmetadata"),
        )
        .when(
            F.instr(orig, "</html>") > 0,
            inject(stripped, "</html>", "htmmetadata"),
        )
        .otherwise(
            F.concat(
                F.trim(stripped),
                F.lit("<div id='nodata' style='display:none;'>"), sbt,
                F.lit("</div>"),
            )
        )
    )

    marking = parse_marking_info_lower_notrim(F.col("MarkingInfo").cast("string"))
    taginfo = F.when(
        F.col("TagInfo").isNotNull() & (_s("TagInfo") != ""),
        F.filter(
            F.transform(
                F.flatten(
                    F.transform(
                        F.split(_s("TagInfo"), r"\$"),
                        lambda e: F.split(e, r"\|"),
                    )
                ),
                lambda tag: F.when(
                    tag != "",
                    F.struct(
                        F.coalesce(
                            _f(F.split(tag, r"\^"), 1), F.lit("")
                        ).alias("id"),
                        _f(F.split(tag, r"\^"), 2).alias("name"),
                    ),
                ),
            ),
            lambda s: s.isNotNull(),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(None).cast("string").alias("id"),
                F.lit(None).cast("string").alias("name"),
            )
        )
    )

    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lit(20).alias("documenttypeboost"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("filenamepath")).alias("filenamepath"),
        F.when(
            (year != "") & (year != "0000"),
            F.struct(year.alias("id"), year.alias("name")),
        ).alias("year"),
        F.struct(
            F.struct(
                m_single(1, "productid").alias("prodid"),
                m_single(2, "dateofpublication").alias("dateofpublication"),
                m_single(3, "booktype").alias("booktype"),
            ).alias("info")
        ).alias("masterinfo"),
        parse_categories(F.col("categoriescentax")).alias("categories"),
        groups.alias("groups"),
        F.coalesce(
            _f(F.split(_s("documentdate"), r"\^"), 1), F.lit("")
        ).alias("documentdate"),
        heading.alias("heading"),
        subheading.alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lower(F.trim(_s("sortheadingnumber"))).alias("sortheadingnumber"),
        F.lower(F.trim(_s("searchheadingnumber"))).alias(
            "searchheadingnumber"
        ),
        parentheadings.alias("parentheadings"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        fullcontent.alias("fullcontent"),
        F.when(
            orig.contains("<header>"), get_meta_tag(orig)
        ).otherwise(F.lit("")).alias("xmltag"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lower(F.trim(_s("language"))).alias("language"),
        marking.alias("markinginfo"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstoryheading"], F.lit("")
        ).alias("topstoryheading"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstorydesc"], F.lit("")
        ).alias("topstorydesc"),
        taginfo.alias("taginfo"),
    )
    return out


# --- the Treaty pipeline (ts:5922-6496) ------------------------------------

TREATY_INPUT_COLUMNS = [
    "mid", "id", "documenttype", "documentformat", "url",
    "categoriescentax", "groups", "Hasfile", "ParentHeading", "ShortName",
    "associates", "documentdate", "Heading", "subheading",
    "sortheadingnumber", "searchheadingnumber", "iltassociation",
    "flaginfo", "shortcontent", "fullcontent", "created_date",
    "UpdatedDate",
]

# group-id-keyed name overrides + sortheadingnumber prefixes (ts:6101-6106,
# 6161-6173)
_TREATY_OLD_ID = "111050000000011236"
_TREATY_COUNTRY_ID = "111050000000011126"
_TREATY_MODEL_10_IDS = (
    "108690000000000523", "108690000000000488", "108690000000000524",
    "108690000000000065", "108690000000000066",
)


def _treaty_groups(col: Column | str) -> Column:
    """Treaty 4-level groups (ts:6085-6123): '|'-split levels of
    ``id^name#ordering`` (ordering defaults '0'); subsubgroup names
    override by id for the Repealed/Country treaty nodes; the group level
    itself carries an ordering."""
    c = _c(col).cast("string")
    parts = F.split(c, r"\|")

    def level(i: int):
        seg = _f(parts, i)
        idn = F.split(seg, r"\^")
        lid = F.trim(F.coalesce(_f(idn, 1), F.lit("")))
        blk = F.coalesce(_f(idn, 2), F.lit(""))
        has = F.instr(blk, "#") > 0
        name = F.trim(
            F.when(has, _f(F.split(blk, "#"), 1)).otherwise(blk)
        )
        ordering = F.when(
            has, F.trim(F.coalesce(_f(F.split(blk, "#"), 2), F.lit("")))
        ).otherwise(F.lit("0"))
        return seg, lid, name, ordering

    _g, g_id, g_name, g_ord = level(1)
    sg_seg, sg_id, sg_name, sg_ord = level(2)
    ssg_seg, ssg_id, ssg_name_raw, ssg_ord = level(3)
    sssg_seg, sssg_id, sssg_name, sssg_ord = level(4)
    sg_ok = F.instr(F.coalesce(sg_seg, F.lit("")), "^") > 0
    ssg_ok = ssg_seg.isNotNull() & (ssg_seg != "")
    sssg_ok = sssg_seg.isNotNull() & (sssg_seg != "")
    ssg_name = (
        F.when(ssg_id == _TREATY_OLD_ID, F.lit("Repealed or Old Treaties"))
        .when(ssg_id == _TREATY_COUNTRY_ID, F.lit("Country Treaties"))
        .otherwise(ssg_name_raw)
    )

    def e(ok: Column, v: Column) -> Column:
        return F.when(ok, v).otherwise(F.lit(""))

    sssg = F.struct(
        e(sssg_ok, sssg_id).alias("id"),
        e(sssg_ok, sssg_name).alias("name"),
        e(sssg_ok, sssg_ord).alias("ordering"),
        e(sssg_ok & (sssg_name != ""), slugify(F.lower(sssg_name))).alias(
            "url"
        ),
    )
    ssg = F.struct(
        e(ssg_ok, ssg_id).alias("id"),
        e(ssg_ok, ssg_name).alias("name"),
        e(ssg_ok, ssg_ord).alias("ordering"),
        e(ssg_ok & (ssg_name != ""), slugify(F.lower(ssg_name))).alias(
            "url"
        ),
        sssg.alias("subsubsubgroup"),
    )
    sg = F.struct(
        e(sg_ok, sg_id).alias("id"),
        e(sg_ok, sg_name).alias("name"),
        e(sg_ok, sg_ord).alias("ordering"),
        e(sg_ok & (sg_name != ""), slugify(F.lower(sg_name))).alias("url"),
        ssg.alias("subsubgroup"),
    )
    return F.when(
        c.isNotNull(),
        F.struct(
            F.struct(
                g_id.alias("id"), g_name.alias("name"),
                g_ord.alias("ordering"),
                slugify(F.lower(g_name)).alias("url"),
                sg.alias("subgroup"),
            ).alias("group")
        ),
    )


@plan_cached("treaty")
def treaty_document(
    df: DataFrame, doc_type: int = 8, templateid: str = ""
) -> DataFrame:
    """TreatyIndex re-expressed (solrIndexCreation.ts:5922-6496) — tax
    treaties (docType 8). Same narrow-plan contract as the other
    pipelines.

    Faithful quirks kept: the year derives from the GROUPS column (text
    after the last '^', before any '#', only when < 6 chars); no final
    3-id category filter and no 'centax ' strip; parentheadings come from
    ParentHeading+ShortName with an 18-zero default id and a
    Hasfile-derived hasfile; sortheadingnumber gets the 40/10/30/20
    group-keyed prefix for docType 8; boost 2000; masterinfo carries only
    iltinfoes (the reference's Info stays an empty object — omitted
    here); heading keeps 'a|b' only when exactly two '|' parts and the
    second is non-blank.
    Deviation: the 'undefined' pid concat (see parse_iltinfo_treaty)."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, TREATY_INPUT_COLUMNS)
    groups_raw = _s("groups")

    # year from groups: text after the LAST '^', before any '#'
    # (ts:5956-5962)
    tail = F.substring_index(groups_raw, "^", -1)
    yraw = F.coalesce(_f(F.split(tail, "#"), 1), F.lit(""))
    yclean = F.trim(F.regexp_replace(yraw, r"\|", " "))
    year_ok = (yraw != "") & (F.length(yraw) < 6)
    year_struct = F.when(
        year_ok, F.struct(yclean.alias("id"), yclean.alias("name"))
    ).otherwise(F.struct(F.lit("").alias("id"), F.lit("").alias("name")))
    year_id = F.when(year_ok, yclean).otherwise(F.lit("0000"))

    # precompute: the ilt names lambda embeds the groups-derived year_id;
    # the select's OUTPUT alias "groups" (a struct) would laterally
    # shadow the input column inside that lambda (see case_laws_document
    # note)
    df = df.withColumn(
        "_ilt",
        parse_iltinfo_treaty(
            F.col("iltassociation"), F.col("flaginfo"), year_id
        ),
    )
    ilt = F.col("_ilt")

    # parentheadings (ts:6126-6132)
    has_file = F.when(
        F.lower(_s("Hasfile")).contains("yes"), F.lit("yes")
    ).otherwise(F.lit("no"))
    p0 = F.coalesce(_f(F.split(_s("ParentHeading"), r"\$"), 1), F.lit(""))
    shortname = _s("ShortName")
    parentheadings = F.when(
        F.col("ParentHeading").isNotNull() & (F.length(p0) > 15),
        F.array(
            F.struct(
                F.trim(p0).alias("id"),
                F.trim(shortname).alias("name"),
                F.lower(F.trim(shortname)).alias("ordering"),
                F.lit("yes").alias("hasfile"),
            )
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit("000000000000000000").alias("id"),
                F.lit("").alias("name"), F.lit("").alias("ordering"),
                has_file.alias("hasfile"),
            )
        )
    )

    # associates.subject from the packed 'associates' column (ts:6133-6147)
    asc = _s("associates")
    a_name_blk = F.coalesce(_f(F.split(asc, r"\^"), 2), F.lit(""))
    a_has = F.instr(F.trim(a_name_blk), "#") > 0
    a_name = F.when(
        a_has, _f(F.split(a_name_blk, "#"), 1)
    ).otherwise(F.trim(a_name_blk))
    subject_assoc = F.when(
        F.col("associates").isNotNull(),
        F.array(
            F.struct(
                F.trim(_f(F.split(asc, r"\^"), 1)).alias("id"),
                F.lit("subject").alias("type"),
                a_name.alias("name"),
                F.when(
                    a_has,
                    F.coalesce(_f(F.split(a_name_blk, "#"), 2), F.lit("")),
                ).otherwise(F.lit("")).alias("ordering"),
                F.lit("").alias("associatedDocid"),
                slugify(a_name).alias("url"),
            )
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<id:string,type:string,name:string,"
            "ordering:string,associatedDocid:string,url:string>>"
        )
    )

    # sortheadingnumber group-keyed prefix (ts:6161-6175)
    shn = F.lower(F.trim(_s("sortheadingnumber")))
    mid_trim = F.trim(_s("mid"))
    if doc_type == 8:
        shn_out = (
            F.when(
                groups_raw.contains(_TREATY_OLD_ID + "^Old Treaties"),
                F.concat(F.lit("40"), shn),
            )
            .when(
                groups_raw.contains("111050000000011127^Model Treaties"),
                F.when(
                    mid_trim.isin(*_TREATY_MODEL_10_IDS),
                    F.concat(F.lit("10"), shn),
                ).otherwise(F.concat(F.lit("30"), shn)),
            )
            .when(
                groups_raw.contains(_TREATY_COUNTRY_ID + "^Treaties"),
                F.concat(F.lit("20"), shn),
            )
            .otherwise(shn)
        )
    else:
        shn_out = shn

    searchhn = F.lower(F.trim(_s("searchheadingnumber")))
    sbt = remove_special_with_space(
        F.concat_ws(
            " ",
            F.lower(_s("categoriescentax")), F.lower(groups_raw),
            searchhn,
            F.trim(F.try_element_at(parentheadings, F.lit(1))["name"]),
        )
    )

    # heading join quirk (ts:6151-6157)
    hparts = F.split(_s("Heading"), r"\|")
    heading = F.when(
        (F.size(hparts) == 2)
        & (F.trim(F.coalesce(_f(hparts, 2), F.lit(""))) != ""),
        F.trim(F.concat(_f(hparts, 1), F.lit("|"), _f(hparts, 2))),
    ).otherwise(F.trim(F.coalesce(_f(hparts, 1), F.lit(""))))

    suggest = F.filter(
        F.array(
            _suggest(ilt["countries"], 8),
            _suggest(ilt["articles"], 1),
            _suggest(ilt["subjects"], 16),
        ),
        lambda s: s.isNotNull(),
    )

    docdate = F.coalesce(
        F.when(
            _f(F.split(_s("documentdate"), r"\^"), 1) != "",
            _f(F.split(_s("documentdate"), r"\^"), 1),
        ),
        F.lit("19000101"),
    )
    content = split_footnotes(
        F.col("fullcontent"), F.lower(_s("documentformat"))
    )

    out = df.select(
        mid_trim.alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        year_struct.alias("year"),
        parse_categories(F.col("categoriescentax")).alias("categories"),
        _treaty_groups(F.col("groups")).alias("groups"),
        parentheadings.alias("parentheadings"),
        F.struct(subject_assoc.alias("subject")).alias("associates"),
        docdate.alias("documentdate"),
        F.try_to_date(docdate, "yyyyMMdd").alias("formatteddocumentdate"),
        heading.alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        shn_out.alias("sortheadingnumber"),
        searchhn.alias("searchheadingnumber"),
        F.lit(2000).alias("documenttypeboost"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lit("").alias("language"),
        F.struct(ilt["trees"].alias("iltinfoes")).alias("masterinfo"),
        F.struct(
            F.transform(
                ilt["names"], lambda n: F.struct(n.alias("name"))
            ).alias("formattediltcitation")
        ).alias("searchiltcitation"),
        suggest.alias("Suggest"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        finalize_fullcontent(
            F.when(
                _s("fullcontent").contains("<header>"),
                removed_header_tag(content["body"]),
            ).otherwise(content["body"]),
            sbt,
        ).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        parse_docdate(F.col("created_date")).alias("created_date"),
        parse_docdate(F.col("UpdatedDate")).alias("updated_date"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        F.lit(1000).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
    )
    return out


# --- the News pipeline (ts:8067-8406) --------------------------------------

NEWS_INPUT_COLUMNS = [
    "mid", "id", "documenttype", "documentformat", "url",
    "categoriescentax", "groups", "Heading", "subheading", "sortheading",
    "sortheadingnumber", "searchheadingnumber", "language", "MarkingInfo",
    "TagInfo", "documentdate", "shortcontent", "fullcontent",
    "created_date", "UpdatedDate",
]


def _news_groups(col: Column | str, doc_type: int) -> Column:
    """News 3-level groups (ts:8190-8222): '|'-split; each level
    ``id^name#ordering``; level 0 = group (docType 3 → 'form'), level 1 =
    subgroup, level 2 = subsubgroup nested under it."""
    c = _c(col).cast("string")
    parts = F.split(c, r"\|")

    def level(i: int):
        seg = _f(parts, i)
        idn = F.split(seg, r"\^")
        name_blk = F.coalesce(_f(idn, 2), F.lit(""))
        name = F.trim(F.coalesce(_f(F.split(name_blk, "#"), 1), F.lit("")))
        ordering = F.trim(
            F.coalesce(_f(F.split(name_blk, "#"), 2), F.lit(""))
        )
        return seg, F.trim(F.coalesce(_f(idn, 1), F.lit(""))), name, ordering

    g_seg, g_id, g_name, _go = level(1)
    sg_seg, sg_id, sg_name, sg_ord = level(2)
    ssg_seg, ssg_id, ssg_name, ssg_ord = level(3)
    sg_ok = sg_seg.isNotNull() & (sg_seg != "")
    ssg_ok = ssg_seg.isNotNull() & (ssg_seg != "")

    def e(ok: Column, v: Column) -> Column:
        return F.when(ok, v).otherwise(F.lit(""))

    subsub = F.struct(
        e(ssg_ok, ssg_id).alias("id"),
        e(ssg_ok, ssg_name).alias("name"),
        e(ssg_ok, ssg_ord).alias("ordering"),
        e(ssg_ok & (ssg_name != ""), slugify(F.lower(ssg_name))).alias(
            "url"
        ),
    )
    sub = F.struct(
        e(sg_ok, sg_id).alias("id"),
        e(sg_ok, sg_name).alias("name"),
        e(sg_ok, sg_ord).alias("ordering"),
        e(sg_ok & (sg_name != ""), slugify(F.lower(sg_name))).alias("url"),
        subsub.alias("subsubgroup"),
    )
    name = F.lit("form") if doc_type == 3 else g_name
    url = F.lit("form") if doc_type == 3 else slugify(F.lower(g_name))
    return F.when(
        c.isNotNull(),
        F.struct(
            F.struct(
                g_id.alias("id"), name.alias("name"), url.alias("url"),
                sub.alias("subgroup"),
            ).alias("group")
        ),
    )


@plan_cached("news")
def news_document(
    df: DataFrame, doc_type: int = 5, templateid: str = ""
) -> DataFrame:
    """NewsIndex re-expressed (solrIndexCreation.ts:8067-8406) — news
    items. The slimmest pipeline: no year/masterinfo/associates/Suggest,
    and — faithful quirk — NO final 3-id category filter and no
    'centax ' strip (the whitelist still applies inside the category
    grammar); heading is NOT trimmed (ts:8225); groups go three levels
    deep with '#'-ordering names. MarkingInfo uses the News variant
    (text raw, parentmarking case preserved — ts:8250,8274; the News
    loop's extra '~'-presence date gate is subsumed by the shared split
    pyramid); TagInfo entries without '|' would crash the reference's
    row — skipped here."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, NEWS_INPUT_COLUMNS)
    heading_raw = F.col("Heading").cast("string")

    marking = parse_marking_info_news(F.col("MarkingInfo").cast("string"))
    content = split_footnotes(
        F.col("fullcontent"), F.lower(_s("documentformat"))
    )
    sbt = remove_special_with_space(
        F.concat_ws(
            " ",
            F.lower(_s("categoriescentax")), F.lower(_s("groups")),
            F.trim(_s("Heading")), F.trim(_s("subheading")),
        )
    )
    docdate = F.coalesce(
        _f(F.split(_s("documentdate"), r"\^"), 1), F.lit("")
    )

    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        # whitelist applies; the final 3-id filter does NOT (no
        # filteredCategory block in NewsIndex)
        parse_categories(F.col("categoriescentax")).alias("categories"),
        _news_groups(F.col("groups"), doc_type).alias("groups"),
        heading_raw.alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lower(F.trim(_s("sortheadingnumber"))).alias("sortheadingnumber"),
        F.lower(F.trim(_s("searchheadingnumber"))).alias(
            "searchheadingnumber"
        ),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lower(F.trim(_s("language"))).alias("language"),
        marking.alias("markinginfo"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstoryheading"], F.lit("")
        ).alias("topstoryheading"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstorydesc"], F.lit("")
        ).alias("topstorydesc"),
        _cirnot_taginfo(F.col("TagInfo")).alias("taginfo"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        finalize_fullcontent(
            F.when(
                _s("fullcontent").contains("<header>"),
                removed_header_tag(content["body"]),
            ).otherwise(content["body"]),
            sbt,
        ).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        docdate.alias("documentdate"),
        F.try_to_date(
            F.when(docdate != "", docdate).otherwise(F.lit("19000101")),
            "yyyyMMdd",
        ).alias("formatteddocumentdate"),
        parse_docdate(F.col("created_date")).alias("created_date"),
        parse_docdate(F.col("UpdatedDate")).alias("updated_date"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        F.lit(1000).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
    )
    return out


# --- the Form pipeline (ts:3194-3801) --------------------------------------

FORM_INPUT_COLUMNS = [
    "mid", "id", "documenttype", "documentformat", "filenamepath", "url",
    "year", "DDA_Acts", "categoriescentax", "groups", "Heading",
    "subheading", "sortheading", "sortheadingnumber", "searchheadingnumber",
    "language", "FormSubject", "masterinfo", "TaggingInfo", "documentdate",
    "shortcontent", "fullcontent", "created_date", "UpdatedDate",
]


def _form_acts(col: Column | str) -> Column:
    """Form DDA_Acts (ts:3243-3295) → struct{act, section}: the simple
    associate variant — no popular-acts dictionary, no parent-section
    override; act name keeps any '~ordering' tail; section gets the
    'Section - ' prefix when its first char is a digit OR whitespace
    (JS ``Number(' ') === 0`` quirk kept) and splits '~' AFTER the
    prefix. Null/size<=1 list → null fields."""
    c = _c(col)
    elems = F.filter(
        F.split(c, r"\$"), lambda e: F.size(F.split(e, r"\|")) > 1
    )

    def typ_of(e: Column) -> Column:
        return F.lower(
            F.coalesce(
                _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1), F.lit("")
            )
        )

    def act_struct(e: Column) -> Column:
        name = F.coalesce(
            _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
        )
        return F.struct(
            F.trim(_f(F.split(e, r"\|"), 1)).alias("id"),
            typ_of(e).alias("type"),
            name.alias("name"),
            F.lit("").alias("ordering"),
            F.lit("").alias("associatedDocid"),
            slugify(F.lower(name)).alias("url"),
        )

    def sec_struct(e: Column) -> Column:
        first = F.trim(_f(F.split(e, r"\|"), 1))
        pair = F.split(first, "#")
        raw = F.coalesce(
            _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
        )
        pref = F.when(
            (raw != "") & F.substring(raw, 1, 1).rlike(r"[0-9\s]"),
            F.concat(F.lit("Section - "), raw),
        ).otherwise(raw)
        name = F.coalesce(_f(F.split(pref, "~"), 1), F.lit(""))
        ordering = F.coalesce(_f(F.split(pref, "~"), 2), F.lit(""))
        return F.when(
            (F.instr(first, "#") > 0)
            & (F.coalesce(_f(pair, 2), F.lit("")) != ""),
            F.struct(
                _f(pair, 2).alias("id"),
                typ_of(e).alias("type"),
                name.alias("name"),
                ordering.alias("ordering"),
                _f(pair, 1).alias("associatedDocid"),
                slugify(F.lower(name)).alias("url"),
            ),
        )

    acts = F.transform(
        F.filter(elems, lambda e: F.trim(typ_of(e)) == "act"), act_struct
    )
    secs = F.filter(
        F.transform(
            F.filter(elems, lambda e: F.trim(typ_of(e)) != "act"),
            sec_struct,
        ),
        lambda s: s.isNotNull(),
    )
    ok = c.isNotNull() & (F.size(F.split(c, r"\$")) > 1)
    return F.struct(
        F.when(ok, acts).alias("act"), F.when(ok, secs).alias("section")
    )


def _form_masterinfo(col: Column | str, pdf_path: Column) -> Column:
    """Form packed masterinfo (ts:3504-3631): '$'-list of
    ``id|type^name`` with type ∈ language/form/state/formtype →
    struct{language, instruction, form, state, formtype}. Language names
    split ',' into (language, instruction); language urls derive from the
    row's pdf path ('english' keeps it, others suffix '-{name}.pdf');
    the reference's external pdfFileManagement/S3 calls are identity
    no-ops here (S6). form/state/formtype names carry '#ordering'."""
    c = _c(col)
    elems = F.filter(F.split(c, r"\$"), lambda e: e != "")

    def parts(e: Column):
        p = F.split(e, r"\|")
        mid0 = F.trim(F.coalesce(_f(p, 1), F.lit("")))
        second = _f(p, 2)
        typ = F.lower(
            F.trim(F.coalesce(_f(F.split(second, r"\^"), 1), F.lit("")))
        )
        pname = F.coalesce(_f(F.split(second, r"\^"), 2), F.lit(""))
        return mid0, typ, pname

    def name_ord(raw: Column):
        has = F.instr(raw, "#") > 0
        name = F.when(has, _f(F.split(raw, "#"), 1)).otherwise(raw)
        ordering = F.when(
            has, F.trim(F.coalesce(_f(F.split(raw, "#"), 2), F.lit("")))
        ).otherwise(F.lit(""))
        return name, ordering, F.coalesce(
            ordering.try_cast("int"), F.lit(0)
        )

    def generic(e: Column, want: str) -> Column:
        mid0, typ, pname = parts(e)
        name, ordering, oi = name_ord(pname)
        return F.when(
            typ == want,
            F.struct(
                mid0.alias("id"),
                F.lit(want).alias("type"),
                name.alias("name"),
                ordering.alias("ordering"),
                oi.alias("orderInteger"),
                slugify(F.lower(name)).alias("url"),
            ),
        )

    def lang_url(name: Column) -> Column:
        return F.when(F.lower(name) == "english", pdf_path).otherwise(
            F.regexp_replace(
                pdf_path, r"(?i)\.pdf$",
                F.concat(F.lit("-"), name, F.lit(".pdf")),
            )
        )

    def lang(e: Column) -> Column:
        mid0, typ, pname = parts(e)
        # NB language/instruction NAMES keep any '#ordering' text — only
        # the ordering fields split on '#' (ts:3537-3539, 3551-3553)
        lname = F.trim(F.coalesce(_f(F.split(pname, ","), 1), F.lit("")))
        _n, ordering, oi = name_ord(lname)
        return F.when(
            (typ == "language") & (lname != ""),
            F.struct(
                mid0.alias("id"), F.lit("language").alias("type"),
                lname.alias("name"), ordering.alias("ordering"),
                oi.alias("orderInteger"), lang_url(lname).alias("url"),
            ),
        )

    def instr_(e: Column) -> Column:
        mid0, typ, pname = parts(e)
        lname = F.trim(F.coalesce(_f(F.split(pname, ","), 1), F.lit("")))
        iname = F.trim(F.coalesce(_f(F.split(pname, ","), 2), F.lit("")))
        _n, ordering, oi = name_ord(iname)
        url = F.regexp_replace(lang_url(lname), "FormITR", "Instructions")
        return F.when(
            (typ == "language") & (iname != ""),
            F.struct(
                mid0.alias("id"), F.lit("Instruction").alias("type"),
                iname.alias("name"), ordering.alias("ordering"),
                oi.alias("orderInteger"), url.alias("url"),
            ),
        )

    def arr(builder) -> Column:
        return F.filter(
            F.transform(elems, builder), lambda s: s.isNotNull()
        )

    return F.struct(
        arr(lang).alias("language"),
        arr(instr_).alias("instruction"),
        arr(lambda e: generic(e, "form")).alias("form"),
        arr(lambda e: generic(e, "state")).alias("state"),
        arr(lambda e: generic(e, "formtype")).alias("formtype"),
    )


@plan_cached("form")
def form_document(df: DataFrame, templateid: str = "") -> DataFrame:
    """FormIndex re-expressed (solrIndexCreation.ts:3194-3801) — tax
    forms (docType 3). Same narrow-plan contract as the other pipelines.

    Faithful quirks kept: the year guard skips ANY value containing
    '0000' (``indexOf('0000') === -1`` — so packed 18+4 years, whose ids
    embed zeros, never populate); masterinfo.info exists only when the
    packed masterinfo has >1 '$'-elements; the searchboosttext master
    text is '' unless the column contains '$frmtyp' (inverted includes,
    ts:3634); taginfo parses the WHOLE TaggingInfo as one '|'-entry (the
    '$'-branch is unreachable — its guard is inverted, ts:3692); the
    subgroup Suggest push is a no-op (inverted empty-name guard,
    ts:3435) and is omitted; 'Form - ' heading prefix applies to empty
    or digit-leading headings; content injection keys on
    ``endsWith('</document>'|'</html>')``; boost 7500 (0 when repealed);
    Form subcategory default id = category id (subcat_id_from_first).
    Deviations: pdfFileManagement/S3 are identity no-ops (S6);
    updated_date None outside the 8/14-char shapes."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, FORM_INPUT_COLUMNS)
    heading_raw = _s("Heading")
    year = F.trim(_s("year"))
    pdf_path = F.trim(_s("filenamepath"))

    heading = F.when(
        (F.trim(heading_raw) == "")
        | F.substring(heading_raw, 1, 1).rlike(r"[0-9\s]"),
        F.concat(F.lit("Form - "), heading_raw),
    ).otherwise(heading_raw)

    assoc = _form_acts(F.col("DDA_Acts"))
    subjects = parse_subjects(F.col("FormSubject"), with_short=True)
    # precompute: the select aliases its OUTPUT "filenamepath" to a
    # language url, and Spark 4.1's lateral alias resolution would feed
    # that alias back into any sibling expression reading
    # col("filenamepath") — the pdf-path transform would apply twice
    # (see case_laws_document note)
    df = df.withColumn(
        "_minfo", _form_masterinfo(F.col("masterinfo"), pdf_path)
    )
    minfo = F.col("_minfo")
    has_minfo = F.col("masterinfo").isNotNull() & (
        F.size(F.split(_s("masterinfo"), r"\$")) > 1
    )
    # formno url: JS replace(' ','') removes the FIRST space only
    pos = F.instr(heading, " ")
    formno_url = F.lower(
        F.when(
            pos > 0,
            F.concat(
                heading.substr(F.lit(1), pos - 1),
                heading.substr(pos + 1, F.length(heading)),
            ),
        ).otherwise(heading)
    )
    formno = F.when(
        F.trim(heading) != "",
        F.array(
            F.struct(
                F.lit("form").alias("type"),
                heading.alias("name"),
                F.lit(0).alias("orderInteger"),
                formno_url.alias("url"),
            )
        ),
    )

    # masterinfo search text: '' unless '$frmtyp' present (inverted
    # includes quirk, ts:3634)
    mraw = F.lower(_s("masterinfo"))
    mtext = F.when(mraw.contains("$frmtyp"), mraw).otherwise(F.lit(""))
    sbt = remove_special_with_space(
        F.concat_ws(
            " ",
            F.lower(_s("categoriescentax")), F.lower(_s("groups")),
            F.lower(year), string_only(mtext),
            F.trim(heading_raw), F.trim(_s("subheading")),
        )
    )

    tagging = _s("TaggingInfo")
    repealed = tagging.isin(
        "222210000000000002|TC1^Repealed Act",
        "222210000000000041|TC_Service_Tax_Repealed^Service Tax Repealed",
    )
    taginfo = F.when(
        (tagging != "") & (F.size(F.split(tagging, r"\|")) > 1),
        F.array(
            F.struct(
                F.coalesce(
                    _f(F.split(_f(F.split(tagging, r"\|"), 2), r"\^"), 1),
                    F.lit(""),
                ).alias("id"),
                F.coalesce(
                    _f(F.split(_f(F.split(tagging, r"\|"), 2), r"\^"), 2),
                    F.lit(""),
                ).alias("name"),
            )
        ),
    ).otherwise(
        F.array().cast("array<struct<id:string,name:string>>")
    )

    # groups (ts:3413-3441): group from part 0 '^'-pair, subgroup part 1
    gparts = F.split(_s("groups"), r"\|")
    g0 = F.split(F.coalesce(_f(gparts, 1), F.lit("")), r"\^")
    sg = F.split(F.coalesce(_f(gparts, 2), F.lit("")), r"\^")
    sg_name = F.trim(F.coalesce(_f(sg, 2), F.lit("")))
    groups = F.when(
        F.col("groups").isNotNull(),
        F.struct(
            F.struct(
                F.trim(F.coalesce(_f(g0, 1), F.lit(""))).alias("id"),
                F.lit("form").alias("name"),
                F.lit("form").alias("url"),
                F.struct(
                    F.trim(F.coalesce(_f(sg, 1), F.lit(""))).alias("id"),
                    sg_name.alias("name"),
                    slugify(F.lower(sg_name)).alias("url"),
                ).alias("subgroup"),
            ).alias("group")
        ),
    )

    per_subject = F.transform(
        subject_names_of(subjects),
        lambda n: F.struct(
            F.array(n).alias("Input"), F.lit(18).alias("Weight")
        ),
    )
    heading_sug = F.when(
        F.trim(heading) != "",
        F.struct(
            F.array(F.lower(F.trim(heading))).alias("Input"),
            F.lit(1).alias("Weight"),
        ),
    )
    suggest = F.filter(
        F.concat(per_subject, F.array(heading_sug)),
        lambda s: s.isNotNull(),
    )

    docdate = F.coalesce(
        _f(F.split(_s("documentdate"), r"\^"), 1), F.lit("19000101")
    )
    created = _s("created_date")
    updated = _s("UpdatedDate")

    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        # the LAST language entry's url overwrites filenamepath (ts:3544)
        F.coalesce(
            F.when(
                has_minfo,
                F.try_element_at(minfo["language"], F.lit(-1))["url"],
            ),
            pdf_path,
        ).alias("filenamepath"),
        F.when(
            (year != "") & ~year.contains("0000"),
            F.when(
                F.length(year) > 4,
                F.struct(
                    F.trim(F.substring(year, 1, 18)).alias("id"),
                    F.trim(F.substring(year, 19, 4)).alias("name"),
                ),
            ).otherwise(F.struct(year.alias("id"), year.alias("name"))),
        ).alias("year"),
        filter_final_categories(
            parse_categories(
                F.col("categoriescentax"), subcat_id_from_first=True
            )
        ).alias("categories"),
        groups.alias("groups"),
        heading.alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lower(F.trim(_s("sortheadingnumber"))).alias("sortheadingnumber"),
        F.lower(F.trim(_s("searchheadingnumber"))).alias(
            "searchheadingnumber"
        ),
        F.array(
            F.struct(
                F.lit("").alias("id"), F.lit("").alias("name"),
                F.lit("").alias("ordering"), F.lit(0).alias("orderInteger"),
            )
        ).alias("parentheadings"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lower(F.trim(_s("language"))).alias("language"),
        F.when(
            has_minfo,
            F.struct(
                F.struct(
                    formno.alias("formno"),
                    minfo["language"].alias("language"),
                    minfo["instruction"].alias("instruction"),
                    minfo["form"].alias("form"),
                    minfo["formtype"].alias("formtype"),
                    minfo["state"].alias("state"),
                    subjects.alias("subject"),
                ).alias("info")
            ),
        ).alias("masterinfo"),
        F.struct(
            assoc["act"].alias("act"), assoc["section"].alias("section")
        ).alias("associates"),
        taginfo.alias("taginfo"),
        F.when(repealed, F.lit(0)).otherwise(F.lit(7500)).alias(
            "documenttypeboost"
        ),
        F.lit(1000).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        split_footnotes(
            F.col("fullcontent"), F.lower(_s("documentformat"))
        )["footnotecontent"].alias("footnotecontent"),
        _form_fullcontent(
            F.col("fullcontent"), F.lower(_s("documentformat")), sbt
        ).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        docdate.alias("documentdate"),
        F.try_to_date(
            F.when(docdate != "", docdate).otherwise(F.lit("19000101")),
            "yyyyMMdd",
        ).alias("formatteddocumentdate"),
        F.when(
            F.length(created) == 14, parse_docdate(F.col("created_date"))
        ).otherwise(F.lit("1900-01-01").cast("timestamp")).alias(
            "created_date"
        ),
        F.when(
            (F.length(updated) > 13)
            | (F.length(F.trim(updated)) == 8),
            parse_docdate(F.col("UpdatedDate")),
        ).alias("updated_date"),
        suggest.alias("Suggest"),
    )
    return out


def _form_fullcontent(
    content: Column, documentformat: Column, boost_text: Column
) -> Column:
    """Form content finalization: footnote split + header strip + the
    ``endsWith``-keyed injection ladder (ts:3685-3689)."""
    parts = split_footnotes(content, documentformat)
    body = F.when(
        F.coalesce(content, F.lit("")).contains("<header>"),
        removed_header_tag(parts["body"]),
    ).otherwise(parts["body"])
    t = F.trim(body)

    def inject_last(tag: str, div_id: str) -> Column:
        div = F.concat(
            F.lit(f"<div id='{div_id}' style='display:none;'>"),
            boost_text, F.lit("</div>"),
        )
        pos = F.instr(t, tag)  # first occurrence (JS replace), but only
        # taken when the string ENDS with the tag
        return F.concat(
            t.substr(F.lit(1), pos - 1), div, t.substr(pos, F.length(t))
        )

    return (
        F.when(t.endswith("</document>"), inject_last("</document>", "xmlmetadata"))
        .when(t.endswith("</html>"), inject_last("</html>", "htmmetadata"))
        .otherwise(
            F.concat(
                t, F.lit("<div id='nodata' style='display:none;'>"),
                boost_text, F.lit("</div>"),
            )
        )
    )


# --- the Article pipeline (ts:4701-5920) -----------------------------------

ARTICLE_INPUT_COLUMNS = [
    "mid", "id", "excusdocid", "documenttype", "documentformat", "url",
    "year", "ExpertSubject", "actassociations", "parentsectioninfo",
    "articlesubjectinfo", "DDA_Rules", "DDA_Caselaw", "categoriescentax",
    "groups", "documentdate", "Heading", "subheading", "sortheading",
    "sortbyauthor", "sortheadingnumber", "shortcontent", "GSTSubjectID",
    "AAAAssociation", "AuthorName", "citation", "fullcitation",
    "iltassociation", "TagInfo", "MarkingInfo", "fullcontent",
    "created_date", "UpdatedDate",
]


def _article_classifications(col: Column | str) -> Column:
    """Article GSTSubjectID variant (ts:5177-5192): '$'-list of
    ``id|name`` ('|' split — unlike the CaseLaws '^' grammar);
    shortName = name, ordering ''."""
    c = _c(col)
    built = F.transform(
        F.filter(F.split(c, r"\$"), lambda e: e != ""),
        lambda e: F.struct(
            F.trim(F.coalesce(_f(F.split(e, r"\|"), 1), F.lit(""))).alias(
                "id"
            ),
            F.lit("classification").alias("type"),
            F.trim(F.coalesce(_f(F.split(e, r"\|"), 2), F.lit(""))).alias(
                "name"
            ),
            F.trim(F.coalesce(_f(F.split(e, r"\|"), 2), F.lit(""))).alias(
                "shortName"
            ),
            F.lit("").alias("ordering"),
            slugify(
                F.lower(
                    F.trim(F.coalesce(_f(F.split(e, r"\|"), 2), F.lit("")))
                )
            ).alias("url"),
        ),
    )
    return F.when(c.isNotNull() & (c != ""), built).otherwise(
        F.slice(built, 1, 0)
    )


def _article_taginfo(col: Column | str) -> Column:
    """Article TagInfo (ts:5763-5780): tag from entry part 0 (unlike
    CirNot's part 1), with a ``validity`` from part 1 unless it is the
    '0^0' placeholder; null column → one empty tag."""
    c = _c(col)

    def build(e: Column) -> Column:
        t0 = _f(F.split(e, r"\|"), 1)
        t1 = _f(F.split(e, r"\|"), 2)
        return F.struct(
            F.coalesce(_f(F.split(t0, r"\^"), 1), F.lit("")).alias("id"),
            F.coalesce(_f(F.split(t0, r"\^"), 2), F.lit("")).alias("name"),
            F.when(
                t1.isNotNull() & (t1 != "") & (t1 != "0^0"),
                _f(F.split(t1, r"\^"), 1),
            ).alias("validity"),
        )

    built = F.transform(
        F.filter(
            F.split(c, r"\$"),
            lambda e: F.coalesce(_f(F.split(e, r"\|"), 1), F.lit("")) != "",
        ),
        build,
    )
    fallback = F.array(
        F.struct(
            F.lit("").alias("id"), F.lit("").alias("name"),
            F.lit(None).cast("string").alias("validity"),
        )
    )
    return F.when(c.isNotNull() & (c != ""), built).otherwise(fallback)


def _article_rules(col: Column | str, pipe_filter: bool = False) -> Column:
    """DDA_Rules (ts:4936-4982; Commentary variant ts:6698-6744) →
    struct{rule, ruleno}: '$'-list (>1 elements); Article keeps entries of
    length>5, Commentary (``pipe_filter=True``) keeps entries with a '|';
    type 'rule' → rule associate; others → ruleno associate ('#'-split id
    pair, 'Rule - ' numeric prefix, requires the ruleno id)."""
    c = _c(col)
    elems = F.filter(
        F.split(c, r"\$"),
        (lambda e: F.size(F.split(e, r"\|")) > 1)
        if pipe_filter
        else (lambda e: F.length(e) > 5),
    )

    def typ_of(e: Column) -> Column:
        return F.lower(
            F.coalesce(
                _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 1), F.lit("")
            )
        )

    def rule_struct(e: Column) -> Column:
        name = F.coalesce(
            _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
        )
        return F.struct(
            F.trim(_f(F.split(e, r"\|"), 1)).alias("id"),
            typ_of(e).alias("type"),
            name.alias("name"),
            F.lit("").alias("associatedDocid"),
            slugify(F.lower(name)).alias("url"),
        )

    def ruleno_struct(e: Column) -> Column:
        first = F.trim(_f(F.split(e, r"\|"), 1))
        pair = F.split(first, "#")
        raw = F.coalesce(
            _f(F.split(_f(F.split(e, r"\|"), 2), r"\^"), 2), F.lit("")
        )
        name = F.when(
            F.substring(raw, 1, 1).rlike("[0-9]"),
            F.concat(F.lit("Rule - "), raw),
        ).otherwise(raw)
        return F.when(
            (F.instr(first, "#") > 0)
            & (F.coalesce(_f(pair, 2), F.lit("")) != ""),
            F.struct(
                _f(pair, 2).alias("id"),
                typ_of(e).alias("type"),
                name.alias("name"),
                _f(pair, 1).alias("associatedDocid"),
                slugify(F.lower(name)).alias("url"),
            ),
        )

    rules = F.transform(
        F.filter(elems, lambda e: F.trim(typ_of(e)) == "rule"), rule_struct
    )
    rulenos = F.filter(
        F.transform(
            F.filter(elems, lambda e: F.trim(typ_of(e)) != "rule"),
            ruleno_struct,
        ),
        lambda s: s.isNotNull(),
    )
    ok = c.isNotNull() & (F.size(F.split(c, r"\$")) > 1)
    return F.struct(
        F.when(ok, rules).alias("rule"),
        F.when(ok, rulenos).alias("ruleno"),
    )


def _article_casereferred(col: Column | str, mid: Column) -> Column:
    """DDA_Caselaw (ts:4985-5015): '$'-list of length>5 entries
    ``id|type^name#date@subheading``; date kept RAW (no dd-mm-yyyy
    conversion, unlike the CaseLaws casereferred); associatedDocid = the
    document's mid. Entries without '#' after the '^' crash the
    reference's row; here the element is skipped (deviation)."""
    c = _c(col)
    elems = F.filter(F.split(c, r"\$"), lambda e: F.length(e) > 5)

    def build(e: Column) -> Column:
        caret = F.split(e, r"\^")
        first, second = _f(caret, 1), _f(caret, 2)
        idtype = F.split(F.trim(first), r"\|")
        namedate = F.split(second, "#")
        rest = _f(namedate, 2)
        has_at = F.instr(_e_(rest), "@") > 0
        return F.when(
            (F.instr(first, "|") > 0)
            & (F.coalesce(_f(idtype, 2), F.lit("")) != "")
            & (F.instr(_e_(second), "#") > 0),
            F.struct(
                _f(idtype, 1).alias("id"),
                _f(idtype, 2).alias("type"),
                F.coalesce(_f(namedate, 1), F.lit("")).alias("name"),
                F.when(
                    has_at, _f(F.split(rest, "@"), 1)
                ).otherwise(F.lit("")).alias("date"),
                F.when(
                    has_at, _f(F.split(rest, "@"), 2)
                ).otherwise(F.lit("")).alias("subheading"),
                mid.alias("associatedDocid"),
                slugify(
                    F.lower(F.coalesce(_f(namedate, 1), F.lit("")))
                ).alias("url"),
            ),
        )

    built = F.filter(F.transform(elems, build), lambda s: s.isNotNull())
    return F.when(c.isNotNull() & (c != ""), built)


def _e_(col: Column) -> Column:
    return F.coalesce(col, F.lit(""))


@plan_cached("article")
def article_document(df: DataFrame, templateid: str = "") -> DataFrame:
    """ArticleIndex re-expressed (solrIndexCreation.ts:4701-5920) —
    expert articles. Same narrow-plan contract as the other pipelines.

    Faithful quirks kept: masterinfo.info.act/section/subject are null
    without an actassociations list (>1 elements) while authors/
    classification/standards always populate (ts:4908-4911 vs 5264-5267);
    per-subject Suggest entries (one entry per subject, unlike CaseLaws'
    one entry with all names); the fullcitation suggest pool (lowercased
    variants + numeric-tail substrings, weight 1); categories use the
    9-id whitelist AND the final 3-id filter; parentheadings is a single
    empty entry; searchheadingnumber/sortbycourt/sortbyname are ''.
    Deviations (documented): the reference's header-strip/xmltag checks
    read ``indexDocument.fullcontent`` before it is assigned (ts:5856,
    5861 — never fires; evidently meant the input column) — we use the
    evident intent; DDA_Caselaw entries that would crash the row are
    skipped; author image S3 uploads are no-ops (S6)."""
    if "heading" in df.columns and "Heading" in df.columns:
        raise ValueError(
            "input carries both 'heading' and 'Heading' — ambiguous"
        )
    if "heading" in df.columns:
        df = df.toDF(
            *[("Heading" if c == "heading" else c) for c in df.columns]
        )
    df = ensure_columns(df, ARTICLE_INPUT_COLUMNS)
    # precompute lambdas' outer column refs (lateral-alias hazard — see
    # case_laws_document)
    df = df.withColumn(
        "_casereferred",
        _article_casereferred(F.col("DDA_Caselaw"), F.trim(_s("id"))),
    )
    heading_raw = _s("Heading")
    year = F.trim(_s("year"))

    subjects = parse_subjects(F.col("ExpertSubject"), with_short=True)
    assoc = parse_act_associations(
        F.col("actassociations"), F.col("parentsectioninfo"), "article"
    )
    has_assoc = F.col("actassociations").isNotNull() & (
        F.size(F.split(_s("actassociations"), r"\$")) > 1
    )
    rules = _article_rules(F.col("DDA_Rules"))
    authors = parse_authors(F.col("AuthorName"))
    author_names = F.filter(
        F.transform(authors, lambda a: F.trim(a["name"])),
        lambda n: n != "",
    )
    aaa = parse_aaa_standards(F.col("AAAAssociation"))
    ilt = parse_iltinfo_article(F.col("iltassociation"))
    marking = parse_marking_info_lower(F.col("MarkingInfo").cast("string"))
    content = split_footnotes(
        F.col("fullcontent"), F.lower(_s("documentformat"))
    )

    # articlesubjectinfo → associates.subject (ts:4918-4933); url slug
    # keeps the original case path (the reference does not lowercase here)
    asi = _s("articlesubjectinfo")
    subject_assoc = F.when(
        F.col("articlesubjectinfo").isNotNull(),
        F.array(
            F.struct(
                F.trim(_f(F.split(asi, r"\^"), 1)).alias("id"),
                F.lit("subject").alias("type"),
                F.trim(
                    F.coalesce(_f(F.split(asi, r"\^"), 2), F.lit(""))
                ).alias("name"),
                F.lit("").alias("associatedDocid"),
                slugify(
                    F.trim(F.coalesce(_f(F.split(asi, r"\^"), 2), F.lit("")))
                ).alias("url"),
            )
        ),
    ).otherwise(
        F.array().cast(
            "array<struct<id:string,type:string,name:string,"
            "associatedDocid:string,url:string>>"
        )
    )

    # Suggest: one entry PER subject (ts:4772-4777) + the fullcitation
    # pool at weight 1 (ts:5489-5507)
    per_subject = F.transform(
        subject_names_of(subjects),
        lambda n: F.struct(
            F.array(n).alias("Input"), F.lit(18).alias("Weight")
        ),
    )
    fc = _s("fullcitation")
    cit_elems = F.filter(
        F.split(fc, r"\|"), lambda e: F.trim(e) != ""
    )
    def cit_tail(e: Column) -> Column:
        # JS substring(indexOf(' ')): no space → indexOf -1 → substring(-1)
        # is the WHOLE string (quirk kept)
        return F.lower(
            F.trim(
                F.when(
                    F.instr(e, " ") > 0, F.substr(e, F.instr(e, " "))
                ).otherwise(e)
            )
        )

    cit_inputs = F.flatten(
        F.transform(
            cit_elems,
            lambda e: F.filter(
                F.array(
                    F.lower(F.trim(e)),
                    F.when(cit_tail(e).rlike("^[0-9]"), cit_tail(e)),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )
    suggest = F.filter(
        F.concat(
            per_subject,
            F.array(
                F.when(
                    (fc != "") & (F.size(cit_inputs) > 0),
                    F.struct(
                        cit_inputs.alias("Input"), F.lit(1).alias("Weight")
                    ),
                )
            ),
        ),
        lambda s: s.isNotNull(),
    )

    sbt = remove_special_with_space(
        F.concat_ws(
            " ",
            F.lower(_s("categoriescentax")), F.lower(_s("groups")),
            F.lower(year), F.lower(fc),
            F.lower(string_only(_s("actassociations"))),
            F.lower(string_only(asi)),
            F.trim(heading_raw), F.trim(_s("subheading")),
            F.array_join(author_names, " "),
        )
    )

    # groups (ts:5132-5149): '^'-split; id = part 0, name = part 1
    garr = F.transform(F.split(_s("groups"), r"\^"), lambda g: F.trim(g))
    g_name = F.coalesce(F.try_element_at(garr, F.lit(2)), F.lit(""))
    groups = F.when(
        F.col("groups").isNotNull(),
        F.struct(
            F.struct(
                F.coalesce(F.try_element_at(garr, F.lit(1)), F.lit("")).alias(
                    "id"
                ),
                g_name.alias("name"),
                slugify(F.lower(g_name)).alias("url"),
                F.struct(
                    F.lit("").alias("id"), F.lit("").alias("name"),
                    F.lit("").alias("url"),
                ).alias("subgroup"),
            ).alias("group")
        ),
    )

    docdate = F.coalesce(
        _f(F.split(_s("documentdate"), r"\^"), 1), F.lit("")
    )

    out = df.select(
        F.trim(_s("mid")).alias("id"),
        F.trim(_s("id")).alias("mid"),
        F.trim(_s("excusdocid")).alias("excusdocid"),
        F.lit(templateid).alias("templateid"),
        F.lower(F.trim(_s("documenttype"))).alias("documenttype"),
        F.lower(F.trim(_s("documentformat"))).alias("documentformat"),
        F.trim(_s("url")).alias("filenamepath"),
        F.when(
            (year != "") & (year != "0000"),
            F.struct(year.alias("id"), year.alias("name")),
        ).alias("year"),
        filter_final_categories(
            parse_categories(F.col("categoriescentax"))
        ).alias("categories"),
        groups.alias("groups"),
        F.trim(heading_raw).alias("heading"),
        F.trim(_s("subheading")).alias("subheading"),
        F.lower(F.trim(_s("sortheading"))).alias("sortheading"),
        F.lit("").alias("sortbycourt"),
        F.lit("").alias("sortbyname"),
        F.lower(F.trim(_s("sortbyauthor"))).alias("sortbyauthor"),
        F.lower(F.trim(_s("sortheadingnumber"))).alias("sortheadingnumber"),
        F.lit("").alias("searchheadingnumber"),
        F.array(
            F.struct(
                F.lit("").alias("id"), F.lit("").alias("name"),
                F.lit("").alias("ordering"),
            )
        ).alias("parentheadings"),
        F.lower(F.trim(_s("url"))).alias("url"),
        F.lit("").alias("language"),
        F.struct(
            F.struct(
                F.when(has_assoc, subjects).alias("subject"),
                F.when(has_assoc, assoc["acts"]).alias("act"),
                F.when(has_assoc, assoc["sections"]).alias("section"),
                authors.alias("authors"),
                _article_classifications(F.col("GSTSubjectID")).alias(
                    "classification"
                ),
                F.slice(
                    _article_classifications(F.col("GSTSubjectID")), 1, 0
                ).alias("subclassification"),
                aaa["standards"].alias("standards"),
                aaa["substandards"].alias("substandards"),
            ).alias("info"),
            parse_citations(F.col("citation")).alias("citations"),
            ilt["trees"].alias("iltinfoes"),
        ).alias("masterinfo"),
        F.struct(
            F.transform(
                search_citation_names(F.col("citation")),
                lambda n: F.struct(n.alias("name")),
            ).alias("formattedcitation")
        ).alias("searchcitation"),
        F.struct(
            F.transform(
                ilt["names"], lambda n: F.struct(n.alias("name"))
            ).alias("formattediltcitation")
        ).alias("searchiltcitation"),
        F.struct(
            F.when(has_assoc, assoc["actassociations"]).alias("act"),
            F.when(has_assoc, assoc["sectionassociations"]).alias("section"),
            subject_assoc.alias("subject"),
            rules["rule"].alias("rule"),
            rules["ruleno"].alias("ruleno"),
            F.col("_casereferred").alias("casereferred"),
        ).alias("associates"),
        F.struct(
            F.when(
                fc != "",
                F.array(
                    F.struct(
                        F.lit("").alias("id"),
                        F.lit("fullcitation").alias("type"),
                        full_citation_name(F.col("fullcitation")).alias(
                            "name"
                        ),
                        F.lit("").alias("shortName"),
                    )
                ),
            ).otherwise(
                F.filter(
                    F.array(
                        F.struct(
                            F.lit("").alias("id"), F.lit("").alias("type"),
                            F.lit("").alias("name"),
                            F.lit("").alias("shortName"),
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
        _article_taginfo(F.col("TagInfo")).alias("taginfo"),
        marking.alias("markinginfo"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstoryheading"], F.lit("")
        ).alias("topstoryheading"),
        F.coalesce(
            F.try_element_at(marking, F.lit(1))["topstorydesc"], F.lit("")
        ).alias("topstorydesc"),
        F.lit(1000).alias("documenttypeboost"),
        F.lit(1000).alias("boostpopularity"),
        F.lit(10).alias("viewcount"),
        F.lit(True).alias("ispublished"),
        F.lit(True).alias("isshowonsite"),
        sbt.alias("searchboosttext"),
        F.trim(_s("shortcontent")).alias("shortcontent"),
        content["footnotecontent"].alias("footnotecontent"),
        finalize_fullcontent(
            F.when(
                _s("fullcontent").contains("<header>"),
                removed_header_tag(content["body"]),
            ).otherwise(content["body"]),
            sbt,
        ).alias("fullcontent"),
        F.when(
            _s("fullcontent").contains("<header>"),
            get_meta_tag(_s("fullcontent")),
        ).otherwise(F.lit("")).alias("xmltag"),
        docdate.alias("documentdate"),
        F.try_to_date(
            F.when(docdate != "", docdate).otherwise(F.lit("19000101")),
            "yyyyMMdd",
        ).alias("formatteddocumentdate"),
        F.when(
            (docdate != "") & (F.trim(docdate) != "19000101"), docdate
        ).otherwise(F.lit("")).alias("displaydocumentdatestring"),
        parse_docdate(F.col("created_date")).alias("created_date"),
        parse_docdate(F.col("UpdatedDate")).alias("updated_date"),
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


@plan_cached("act_rule")
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
        F.try_to_date(
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
