"""Reference scalar-function library re-expressed as Catalyst expressions.

Each function mirrors the observable behavior of the reference's ``Common``
class (common.ts) or an inline pattern in solrIndexCreation.ts — including
its quirks, which are documented where they matter. Everything here is pure
Catalyst (regexp_replace / when / concat / lpad chains): JVM-side,
whole-stage-codegen'd, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _ea(arr, i: int):
    """try_element_at with a literal index (ANSI-safe, returns null OOB)."""
    return F.try_element_at(arr, F.lit(i))


# --- F1: GetUrl / slugify (common.ts:4-24) -------------------------------
#
# Faithful to the reference's *actual* behavior:
#  1. trim
#  2. remove only the FIRST '-' (JS String.replace with a string pattern
#     replaces one occurrence)
#  3. lowercase
#  4. remove all of: $ % # @ ! * ? ; : ~ `   (individual chars) and the
#     literal sequence  +=()[]{}|\'<>,/^&".  (the reference's char array's
#     last element is that whole string, matched with includes() — it is
#     NOT a character class; common.ts:9-16)
#  5. spaces → '-'; collapse '--+' → '-'; strip leading/trailing '-'
_SLUG_LITERAL = "+=()[]{}|\\'<>,/^&\"."


def slugify(col: Column | str) -> Column:
    c = F.trim(_c(col))
    # remove only the FIRST '-' (JS replace-with-string semantics)
    pos = F.instr(c, "-")
    c = F.when(
        pos > 0,
        F.concat(c.substr(F.lit(1), pos - 1), c.substr(pos + 1, F.length(c))),
    ).otherwise(c)
    c = F.lower(c)
    c = F.regexp_replace(c, "[$%#@!*?;:~`]", "")
    c = F.replace(c, F.lit(_SLUG_LITERAL), F.lit(""))
    c = F.regexp_replace(c, " ", "-")
    c = F.regexp_replace(c, "--+", "-")
    c = F.trim(c)
    c = F.regexp_replace(c, "^-+|-+$", "")
    return c


# --- F2/F3 (common.ts:275-281) -------------------------------------------
def remove_special_with_space(col: Column | str) -> Column:
    """RemoveSpecialCharacterWithSpace: [^0-9a-zA-Z]+ → ' '."""
    return F.regexp_replace(_c(col), "[^0-9a-zA-Z]+", " ")


def string_only(col: Column | str) -> Column:
    """StringOnly: delete 18-digit id runs (→ single space)."""
    return F.regexp_replace(_c(col), "\\d{18}", " ")


# --- F4: converttoyymmdd (common.ts:265-269) ------------------------------
def ddmmyyyy_to_yyyymmdd(col: Column | str) -> Column:
    """dd-mm-yyyy → yyyymmdd by split/reorder (reference does no
    validation; neither do we — garbage in, garbage out, same garbage)."""
    parts = F.split(_c(col), "-")
    return F.concat(
        F.trim(_ea(parts, 3)),
        F.trim(_ea(parts, 2)),
        F.trim(_ea(parts, 1)),
    )


# --- F5: yyyymmdd[hhmmss] → timestamp (solrIndexCreation.ts:827-844) ------
# NB: many reference sites carry a JS substring(start,end) misuse
# (`substring(4,2)` returns chars 2..4); per SURVEY.md §2.8-F5 we parse the
# *intended* semantics correctly and length-dispatch 8 vs 14 digit forms.
def parse_docdate(col: Column | str) -> Column:
    c = F.trim(_c(col))
    return (
        # try_to_timestamp: a garbled date is the reference's JS Invalid Date
        # (the row survives), not an ANSI error
        F.when(
            F.length(c) >= 14,
            F.try_to_timestamp(F.substring(c, 1, 14), F.lit("yyyyMMddHHmmss")),
        )
        .when(F.length(c) == 8, F.try_to_timestamp(c, F.lit("yyyyMMdd")))
        .otherwise(F.lit(None).cast("timestamp"))
    )


def default_docdate(col: Column | str) -> Column:
    """documentdate normalization: split('^')[0], default '19000101'
    (solrIndexCreation.ts:1929)."""
    first = _ea(F.split(_c(col).cast("string"), "\\^"), 1)
    return F.when(
        first.isNull() | (F.trim(first) == ""), F.lit("19000101")
    ).otherwise(first)


# --- F7: numeric-heading prefix classification (ts:330-351,3445-3451) -----
def classify_heading(col: Column | str, kind: str) -> Column:
    """Numeric-leading heading ⇒ '<Kind> - ' prefix, else unchanged
    (kind ∈ Section/Rule/Regulation/Article/Form per docType dispatch)."""
    c = _c(col)
    return F.when(
        F.substring(F.trim(c), 1, 1).rlike("[0-9]"),
        F.concat(F.lit(f"{kind} - "), c),
    ).otherwise(c)


# --- F8: trailing-dot strip (ts:345-347) -----------------------------------
def strip_trailing_dot(col: Column | str) -> Column:
    return F.regexp_replace(_c(col), "\\.$", "")


# --- F11: header strip / meta extract (common.ts:283-301) ------------------
def removed_header_tag(col: Column | str) -> Column:
    """RemovedHeaderTag: /<header>(.*?)<\\/header>/gi — case-insensitive,
    NOT dot-all (the reference regex has no /s flag; multi-line headers
    survive — quirk preserved)."""
    return F.regexp_replace(_c(col), "(?i)<header>(.*?)</header>", "")


def get_meta_tag(col: Column | str) -> Column:
    """GetMetaTag: concat of all <header>…</header> matches; /gs flags —
    dot-all, case-SENSITIVE (asymmetric with RemovedHeaderTag; preserved)."""
    return F.array_join(
        F.regexp_extract_all(_c(col), F.lit("(?s)(<header>.*?</header>)"), 1), ""
    )


# --- F12: metadata-div injection (ts:806-810,2831-2848) --------------------
def inject_metadata_div(content: Column | str, boost_text: Column | str,
                        kind: str = "xmlmetadata") -> Column:
    """Append <div id='…' style='display:none;'>boost</div> before
    </document> / </html>, else at the end (the reference's 3-way dispatch)."""
    c = _c(content)
    div = F.concat(
        F.lit(f"<div id='{kind}' style='display:none;'>"),
        _c(boost_text),
        F.lit("</div>"),
    )
    return (
        F.when(
            c.contains("</document>"),
            F.concat(F.regexp_replace(c, "</document>$", ""), div, F.lit("</document>")),
        )
        .when(
            c.contains("</html>"),
            F.concat(F.regexp_replace(c, "</html>$", ""), div, F.lit("</html>")),
        )
        .otherwise(F.concat(c, div))
    )


# --- O1: citation sort key (ts:1624-1942) ----------------------------------
def citation_sort_key(master_citation: Column | str) -> Column:
    """MasterCitationOrder 'year|jid^jname|vol|page' → zero-padded composite
    sort key: year(raw) + journal_id(18) + volume lpad(4,'0')/'????' +
    page lpad(7,'0')/'???????'. Missing master → '0000'+0×18+'0000'+'00000000'
    (the reference's else-branch defaults, ts:1680-1685)."""
    c = _c(master_citation)
    parts = F.split(c, "\\|")
    year = _ea(parts, 1)
    journal_id = _ea(F.split(_ea(parts, 2), "\\^"), 1)
    vol_raw = F.trim(_ea(parts, 3))
    page_raw = F.trim(_ea(parts, 4))
    vol = F.when(
        (vol_raw.isNotNull()) & (vol_raw != ""),
        F.lpad(vol_raw.try_cast("int").cast("string"), 4, "0"),
    ).otherwise(F.lit("????"))
    page = F.when(
        (page_raw.isNotNull()) & (page_raw != ""), F.lpad(page_raw, 7, "0")
    ).otherwise(F.lit("???????"))
    present = c.isNotNull() & (F.trim(c) != "")
    return F.when(
        present, F.concat(year, journal_id, vol, page)
    ).otherwise(F.lit("0000" + "0" * 18 + "0000" + "00000000"))


# --- O2: bucketed sort prefix (ts:6161-6175) -------------------------------
def treaty_sort_prefix(group_name: Column | str, base: Column | str) -> Column:
    g = F.lower(_c(group_name))
    prefix = (
        F.when(g.contains("comprehensive"), F.lit("10"))
        .when(g.contains("limited"), F.lit("20"))
        .when(g.contains("other treaties"), F.lit("30"))
        .otherwise(F.lit("40"))
    )
    return F.concat(prefix, _c(base))


# --- O3: numeric sort guard (ts:7814-7817) ---------------------------------
def numeric_sort_guard(col: Column | str) -> Column:
    c = _c(col)
    i = c.try_cast("long")
    return F.when(
        i.isNotNull() & (i < 2147483647), i.cast("int")
    ).otherwise(F.lit(None).cast("int"))


# --- O4: static rank priors ------------------------------------------------
# Court-based boost for case law (ts:2722-2731); doc-type table per SURVEY O4.
def court_boost(court: Column | str) -> Column:
    c = _c(court).cast("string")
    return (
        F.when(c.contains("111270000000000009"), F.lit(5000))  # SC
        .when(c.contains("111270000000000044"), F.lit(4500))   # HC
        .when(c.contains("111270000000000002"), F.lit(4000))   # AAR
        .when(c.contains("111270000000000007"), F.lit(3500))   # ITAT
        .otherwise(F.lit(3200))
    )


DOC_TYPE_BOOSTS = {
    # doc-kind → documenttypeboost (sites in SURVEY.md §2.6 O4)
    "act": 10000, "rule": 8000, "form": 7500, "commentary": 7500,
    "circular": 3000, "aaa": 3000, "notification": 2500, "treaty": 2000,
    "article": 1000, "aaa_opinion": 950, "commentary_other": 900,
    "book": 20, "digest": 0,
}


def doc_type_boost(kind: Column | str) -> Column:
    c = _c(kind)
    expr = F.lit(1500)  # reference default for unmatched groups (ts:4566)
    for k, v in DOC_TYPE_BOOSTS.items():
        expr = F.when(c == k, F.lit(v)).otherwise(expr)
    return expr


def repealed_boost_zero(tagging_info: Column | str, boost: Column | str) -> Column:
    """Repealed-act tags zero the boost (ts:821-825)."""
    t = F.lower(_c(tagging_info).cast("string"))
    return F.when(t.contains("repealed"), F.lit(0)).otherwise(_c(boost))
