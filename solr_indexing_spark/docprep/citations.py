"""Citation grammars — the 5 ``MasterCitationOrder*`` sort-key variants,
the ``citation`` column → ``masterinfo.citations[]`` / ``searchcitation``
structs, and the ``similarfullcitation`` query-expansion fan-out.

Reference sites (re-expressed, not ported):
- sortbycitation (MasterCitationOrder)          solrIndexCreation.ts:1624-1686
- sortbycitationcentax (…Centax)                solrIndexCreation.ts:1689-1747
- sortbycitationcentaxelt / gstl / str          solrIndexCreation.ts:1750-1924
- key concatenation year+journal+vol+page       solrIndexCreation.ts:1938-1942
- citations[] + searchcitation + last-element
  sortheadingnumber election                    solrIndexCreation.ts:2182-2303
- fullcitation normalization                    solrIndexCreation.ts:5396-5408
- similarfullcitation 8-variant fan-out         solrIndexCreation.ts:5409-5487

The three variant behaviors (all quirks kept deliberately):

====== =========================================== ==========================
variant volume field                                page field
====== =========================================== ==========================
master  truthy → parseInt → lpad(4,'0')            truthy → lpad(trim,7,'0')
        falsy  → "????"                            falsy → "???????"
centax  INVERTED guard (ts:1722 ``(!x) ? … : ?``):  inverted likewise:
        empty → "0000" (Number('')==0)             empty → "0000000"
        non-empty → "????"                         non-empty → "???????"
elt     trim!=='' → Number → lpad(4,'0')           trim!=='' → lpad(trim,7)
(=gstl  else "????"                                else "???????"
 =str)
====== =========================================== ==========================

All variants share: year = field0 raw; journal = field1.split('^')[0];
absent/empty packed column → default key ``"0000" + "0"*18 + "0000" +
"00000000"`` (ts:1680-1685). parseInt/Number are emulated as the leading
[+-]?digits prefix; a truthy-but-non-numeric volume yields "0NaN"
(``parseInt('x')→NaN``, ``"NaN".padStart(4,'0')``) in the master variant —
quirk kept. Pure Catalyst expressions; no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scalars import slugify

DEFAULT_SORT_KEY = "0000" + "0" * 18 + "0000" + "00000000"

#: sort-key variant name → MasterCitationOrder* input column it consumes
VARIANT_COLUMNS = {
    "master": "MasterCitationOrder",
    "centax": "MasterCitationOrderCentax",
    "elt": "MasterCitationOrderCentaxElt",
    "gstl": "MasterCitationOrderCentaxGstl",
    "str": "MasterCitationOrderCentaxStr",
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _f(parts: Column, i: int) -> Column:
    return F.try_element_at(parts, F.lit(i))


def _num_prefix(c: Column) -> Column:
    """JS parseInt/Number emulation: leading integer prefix of the trimmed
    string ('' when none — caller maps that to the NaN quirk)."""
    return F.regexp_extract(F.trim(c), r"^[+-]?\d+", 0)


def _volume_name(raw: Column, variant: str) -> Column:
    num = _num_prefix(raw)
    padded = F.when(num != "", F.lpad(num, 4, "0")).otherwise(F.lit("0NaN"))
    if variant == "master":
        # JS truthy on the RAW field (no trim): '' → falsy, ' ' → truthy
        return F.when(
            raw.isNotNull() & (raw != ""), padded
        ).otherwise(F.lit("????"))
    if variant == "centax":
        # inverted guard quirk: empty → Number('')==0 → '0000';
        # non-empty → '????'
        return F.when(
            raw.isNull() | (raw == ""), F.lit("0000")
        ).otherwise(F.lit("????"))
    # elt/gstl/str: trim-aware check
    return F.when(
        raw.isNotNull() & (F.trim(raw) != ""), padded
    ).otherwise(F.lit("????"))


def _page_name(raw: Column, variant: str) -> Column:
    padded = F.lpad(F.trim(raw), 7, "0")
    if variant == "master":
        return F.when(
            raw.isNotNull() & (raw != ""), padded
        ).otherwise(F.lit("???????"))
    if variant == "centax":
        return F.when(
            raw.isNull() | (raw == ""), F.lit("0000000")
        ).otherwise(F.lit("???????"))
    return F.when(
        raw.isNotNull() & (F.trim(raw) != ""), padded
    ).otherwise(F.lit("???????"))


def citation_sort_key_variant(
    col: Column | str, variant: str = "master"
) -> Column:
    """One ``sortbycitation*`` key from one ``MasterCitationOrder*`` packed
    column (``year|journalId^journalName|volume|page``)."""
    if variant in ("gstl", "str"):
        variant = "elt"
    if variant not in ("master", "centax", "elt"):
        raise ValueError(f"unknown citation sort-key variant {variant!r}")
    c = _c(col)
    parts = F.split(c, r"\|")
    year = F.coalesce(_f(parts, 1), F.lit(""))
    journal_id = F.coalesce(
        _f(F.split(_f(parts, 2), r"\^"), 1), F.lit("")
    )
    vol = _volume_name(_f(parts, 3), variant)
    page = _page_name(_f(parts, 4), variant)
    present = c.isNotNull() & (F.trim(c) != "")
    return F.when(
        present, F.concat(year, journal_id, vol, page)
    ).otherwise(F.lit(DEFAULT_SORT_KEY))


def citation_sort_keys(df_cols: dict[str, Column | str] | None = None) -> dict[str, Column]:
    """All five sort keys at once. ``df_cols`` maps variant → input column
    (defaults to the reference's column names, VARIANT_COLUMNS)."""
    cols = {v: (df_cols or {}).get(v, c) for v, c in VARIANT_COLUMNS.items()}
    out_name = {
        "master": "sortbycitation",
        "centax": "sortbycitationcentax",
        "elt": "sortbycitationcentaxelt",
        "gstl": "sortbycitationcentaxgstl",
        "str": "sortbycitationcentaxstr",
    }
    return {
        out_name[v]: citation_sort_key_variant(cols[v], v).alias(out_name[v])
        for v in VARIANT_COLUMNS
    }


# --- citations[] / searchcitation (ts:2182-2303) ---------------------------


def _citinfo(
    id_: Column, name: Column, ordering: Column, type_: str,
    short: Column | None = None,
) -> Column:
    name = F.coalesce(name, F.lit(""))
    return F.struct(
        F.coalesce(id_, F.lit("")).alias("id"),
        F.lit(type_).alias("type"),
        F.coalesce(short if short is not None else name, F.lit("")).alias(
            "shortName"
        ),
        F.coalesce(ordering, F.lit("")).alias("ordering"),
        name.alias("name"),
        slugify(F.lower(name)).alias("url"),
    )


def _one_citation(e: Column) -> Column:
    """One ``year|journalId^journalName|volume|page`` element →
    struct{year, journal, volume, pageno} of citationinfo structs
    (ts:2188-2239; the elt-style truthy-trim padding)."""
    parts = F.split(e, r"\|")
    f0, f2, f3 = _f(parts, 1), _f(parts, 3), _f(parts, 4)
    jparts = F.split(_f(parts, 2), r"\^")
    jid, jname = _f(jparts, 1), _f(jparts, 2)
    num = _num_prefix(f2)
    vol_name = F.when(
        f2.isNotNull() & (F.trim(f2) != ""),
        F.when(num != "", F.lpad(num, 4, "0")).otherwise(F.lit("0NaN")),
    ).otherwise(F.lit("????"))
    page_name = F.when(
        f3.isNotNull() & (F.trim(f3) != ""), F.lpad(F.trim(f3), 7, "0")
    ).otherwise(F.lit("???????"))
    return F.struct(
        _citinfo(f0, f0, f0, "year").alias("year"),
        _citinfo(jid, jname, F.lower(jname), "journal").alias("journal"),
        _citinfo(f2, vol_name, f2, "volume", short=f2).alias("volume"),
        _citinfo(f3, page_name, f3, "page", short=f3).alias("pageno"),
    )


def parse_citations(col: Column | str) -> Column:
    """``citation`` packed column → array of citation structs. A '$'-list
    parses per element; a single (no-'$') citation is a one-element array —
    the two reference branches share per-element semantics (ts:2187-2296).
    A null/blank column yields an empty array (the reference pushes a
    NaN-named citation there which its own ``!!item`` guard then ignores,
    ts:2297-2300 — net effect identical)."""
    c = _c(col)
    built = F.transform(F.split(c, r"\$"), _one_citation)
    # typed empty array: filter-everything over a one-element sample keeps
    # the exact struct type without spelling out the DDL
    empty = F.filter(
        F.array(_one_citation(F.lit(""))), lambda s: F.lit(False)
    )
    return F.when(c.isNotNull() & (F.trim(c) != ""), built).otherwise(empty)


def search_citation_names(col: Column | str) -> Column:
    """``searchcitation.formattedcitation[].name``: per citation,
    year.name + journal.id + volume.name + page.name (ts:2237,2290)."""
    return F.transform(
        parse_citations(col),
        lambda s: F.concat(
            s["year"]["name"], s["journal"]["id"],
            s["volume"]["name"], s["pageno"]["name"],
        ),
    )


def sortheadingnumber_from_citations(col: Column | str) -> Column:
    """The LAST search citation is elected sortheadingnumber
    (ts:2297-2300); empty string when there are none."""
    names = search_citation_names(col)
    return F.coalesce(F.try_element_at(names, F.lit(-1)), F.lit(""))


# --- fullcitation + similarfullcitation fan-out (ts:5396-5487) -------------


def full_citation_name(col: Column | str) -> Column:
    """Normalize the packed fullcitation: replace the FIRST '|' with '/'
    (JS ``.replace`` replaces one occurrence), then drop a leading '/'
    (ts:5397-5407). NB the reference's ``trimEnd('|')`` is a no-arg
    whitespace trim in JS — faithfully NOT stripping trailing pipes."""
    c = F.coalesce(_c(col), F.lit(""))
    # emulate JS replace-first: split at the first '|' and rejoin with '/'
    first = F.instr(c, "|")
    one = F.when(
        first > 0,
        F.concat(
            F.substring(c, F.lit(1), first - 1),
            F.lit("/"),
            F.substr(c, first + 1),
        ),
    ).otherwise(c)
    return F.when(
        F.substring(one, 1, 1) == "/", F.substr(one, F.lit(2))
    ).otherwise(one)


def similar_full_citations(col: Column | str) -> Column:
    """The 8-variant similarfullcitation query-expansion fan-out
    (ts:5409-5487) over the normalized fullcitation name:

    v1 name; v2 without brackets ``[]()``; v3 without brackets and dots;
    v4 brackets/dots → space; and — only when the LAST word contains an
    ``A`` or ``J`` (case-insensitive, the judge-initial convention) — the
    same four over the name with all A/a/J/j stripped from that last word.

    Returns array<string> (4 or 8 elements); empty array for an
    absent/empty fullcitation."""
    name = full_citation_name(col)

    def four(n: Column) -> Column:
        return F.array(
            n,
            F.regexp_replace(n, r"[\[\]\(\)]", ""),
            F.regexp_replace(n, r"[\[\]\(\)\.]", ""),
            F.regexp_replace(n, r"[\[\]\(\)\.]", " "),
        )

    words = F.split(name, " ")
    last = F.try_element_at(words, F.lit(-1))
    has_aj = F.upper(F.coalesce(last, F.lit(""))).rlike("[AJ]")
    stripped_last = F.regexp_replace(last, r"(?i)[aj]", "")
    judge_name = F.concat_ws(
        " ",
        F.concat(
            F.slice(words, F.lit(1), F.size(words) - 1),
            F.array(stripped_last),
        ),
    )
    fanned = F.when(
        has_aj, F.concat(four(name), four(judge_name))
    ).otherwise(four(name))
    present = _c(col).isNotNull() & (F.trim(_c(col)) != "")
    return F.when(present, fanned).otherwise(
        F.array().cast("array<string>")
    )
