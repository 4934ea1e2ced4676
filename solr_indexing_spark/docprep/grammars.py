"""Delimiter-grammar parsers — the reference's de-facto type system.

Every input column in the reference packs structure into strings with
single-char delimiters ($ | ^ # ~ % @, SURVEY.md §1.1). These parsers
re-express the row-loop split() pyramids as Catalyst higher-order functions
(split / transform / filter / element_at) so parsing stays JVM-side and
codegen'd; only the MarkingInfo multi-delimiter grammar
(solrIndexCreation.ts:2643-2655) drops to an Arrow UDF.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .scalars import slugify


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _ea(arr, i: int):
    """try_element_at with a literal index (ANSI-safe, returns null OOB)."""
    return F.try_element_at(arr, F.lit(i))


# Category-id constants (reference constants.ts:1-11)
COMPETITION_CATEGORY = "Competition Law"
TP_CATEGORY = "Transfer Pricing"
ILT_CATEGORY = "International Tax"
FEMA_CATEGORY_ID = "111050000000017777"
COMPANY_CATEGORY_ID = "111050000000017778"
COMPETITION_CATEGORY_ID = "111050000000000006"
TP_CATEGORY_ID = "111050000000017592"
ILT_CATEGORY_ID = "111050000000009188"

# category whitelist (solrIndexCreation.ts:208-219)
REQUIRED_CATEGORY_IDS = [
    "111050000000018392", "111050000000018393", "111050000000018400",
    "111050000000018768", "111050000000018769", "111050000000018770",
    "111050000000018771", "111050000000018772", "111050000000019031",
]
# post-hoc filter ids (solrIndexCreation.ts:2900-2916)
FINAL_CATEGORY_IDS = [
    "111050000000018392", "111050000000018393", "111050000000018400",
]


def parse_categories(
    col: Column | str,
    whitelist: bool = True,
    subcat_id_from_first: bool = False,
) -> Column:
    """categoriescentax 'id^name%flag|id^name$…' → array<struct> of
    {id, name, url, isprimarycat, subcategory{id,name,url}}
    (solrIndexCreation.ts:196-299).

    Faithful quirks: the 9-id whitelist applies only to elements containing
    '|' (the no-pipe branch never checks, ts:285-296); fema/company ids read
    names from segment 1/2, competition/tp/ilt use constants, default reads
    segment 0/1.

    ``whitelist=False`` is the CirNot/Article-family variant
    (ts:3846-3938): the same switch grammar with NO 9-id whitelist —
    every parsed element is kept (the final 3-id filter still applies
    downstream).

    ``subcat_id_from_first=True`` is the FormIndex quirk (ts:3384-3385):
    the default-branch SUBcategory id reads segment 0 (= the category's
    own id) while its name still reads segment 1.
    """
    c = _c(col).cast("string")
    elems = F.filter(F.split(c, "\\$"), lambda e: e != "")

    def pipe_parts(e):
        return F.split(e, "\\|")

    def seg_id(part):  # 'id^name…' → trimmed id
        return F.trim(_ea(F.split(F.trim(part), "\\^"), 1))

    def seg_name(part):  # 'id^name%flag' → name
        return _ea(
            F.split(F.trim(_ea(F.split(part, "\\^"), 2)), "%"), 1
        )

    def is_required(main_cat):
        cond = F.lit(False)
        for rid in REQUIRED_CATEGORY_IDS:
            cond = cond | main_cat.contains(rid)
        return cond

    def cat_struct(cid, name, isprim, sub):
        return F.struct(
            cid.alias("id"),
            name.alias("name"),
            slugify(F.lower(name)).alias("url"),
            isprim.alias("isprimarycat"),
            sub.alias("subcategory"),
        )

    def sub_struct(sid, name):
        return F.struct(
            sid.alias("id"),
            name.alias("name"),
            F.when(name == "", F.lit("")).otherwise(slugify(F.lower(name))).alias("url"),
        )

    def parse_elem(e):
        isprim = F.when(
            F.size(F.split(e, "%")) > 1,
            _ea(F.split(e, "%"), 2).try_cast("int"),
        ).otherwise(F.lit(0))
        parts = pipe_parts(e)
        main_cat = seg_id(_ea(parts, 2))

        special = main_cat.isin(FEMA_CATEGORY_ID, COMPANY_CATEGORY_ID)
        const_cat = (
            F.when(main_cat == COMPETITION_CATEGORY_ID, F.lit(COMPETITION_CATEGORY))
            .when(main_cat == TP_CATEGORY_ID, F.lit(TP_CATEGORY))
            .when(main_cat == ILT_CATEGORY_ID, F.lit(ILT_CATEGORY))
        )
        const_id = F.when(
            main_cat.isin(COMPETITION_CATEGORY_ID, TP_CATEGORY_ID, ILT_CATEGORY_ID),
            main_cat,
        )

        cat_id = F.coalesce(
            const_id,
            F.when(special, seg_id(_ea(parts, 2))).otherwise(
                seg_id(_ea(parts, 1))
            ),
        )
        cat_name = F.coalesce(
            const_cat,
            F.when(special, seg_name(_ea(parts, 2))).otherwise(
                seg_name(_ea(parts, 1))
            ),
        )
        sub_id = F.coalesce(
            const_id,
            F.when(special, seg_id(_ea(parts, 3))).otherwise(
                seg_id(_ea(parts, 1 if subcat_id_from_first else 2))
            ),
        )
        sub_name = F.coalesce(
            const_cat,
            F.when(special, seg_name(_ea(parts, 3))).otherwise(
                seg_name(_ea(parts, 2))
            ),
        )

        with_pipe = cat_struct(cat_id, cat_name, isprim, sub_struct(sub_id, sub_name))
        no_pipe = cat_struct(
            seg_id(e),
            seg_name(e),
            isprim,
            sub_struct(F.lit(""), F.lit("")),
        )
        # JS `indexOf('|') > 0` — a pipe at position 0 counts as NOT piped
        # (1-based instr ⇒ > 1); quirk preserved
        piped = F.instr(e, "|") > 1
        # whitelist applies only to piped elements (ts:219 `continue`);
        # failing elements become null and are filtered out below
        keep = (~piped | is_required(main_cat)) if whitelist else F.lit(True)
        return F.when(keep & piped, with_pipe).when(keep, no_pipe)

    return F.filter(F.transform(elems, parse_elem), lambda p: p.isNotNull())


def filter_final_categories(arr: Column | str) -> Column:
    """P3 (ts:2900-2916): keep 3 ids; strip 'centax ' (case-insensitive)
    from names."""
    a = _c(arr)
    kept = F.filter(a, lambda p: p["id"].isin(FINAL_CATEGORY_IDS))
    return F.transform(
        kept,
        lambda p: p.withField(
            "name", F.regexp_replace(p["name"], "(?i)centax ", "")
        ),
    )


def parse_groups(col: Column | str) -> Column:
    """groups (ts:1597-1618): replace FIRST '|' with ' ', split('^') →
    struct{id, name, url} (1-level; deeper chains via parse_group_chain)."""
    c = _c(col).cast("string")
    pos = F.instr(c, "|")
    replaced = F.when(
        pos > 0,
        F.concat(c.substr(F.lit(1), pos - 1), F.lit(" "), c.substr(pos + 1, F.length(c))),
    ).otherwise(c)
    parts = F.split(F.trim(replaced), "\\^")
    name = F.trim(_ea(parts, 2))
    return F.struct(
        F.trim(_ea(parts, 1)).alias("id"),
        name.alias("name"),
        slugify(F.lower(name)).alias("url"),
    )


def parse_group_chain(col: Column | str) -> Column:
    """'id^name#ord|id^name#ord|…' → array<struct{id,name,ordering,url}> —
    the n-level group chains (treaty ts:6085-6123, book ts:7435-7452)."""
    c = _c(col).cast("string")
    levels = F.filter(F.split(c, "\\|"), lambda e: e != "")

    def parse_level(e):
        idname = F.split(e, "\\^")
        name_ord = F.split(_ea(idname, 2), "#")
        name = F.trim(_ea(name_ord, 1))
        return F.struct(
            F.trim(_ea(idname, 1)).alias("id"),
            name.alias("name"),
            _ea(name_ord, 2).alias("ordering"),
            slugify(F.lower(name)).alias("url"),
        )

    return F.transform(levels, parse_level)


def headnotes_array(*hn_cols: Column | str) -> Column:
    """hn1..hn10 → array<struct{number,text}> of the present ones
    (ts:2676-2717)."""
    structs = [
        F.when(
            _c(c).isNotNull() & (_c(c).cast("string") != ""),
            F.struct(F.lit(i + 1).alias("number"), _c(c).cast("string").alias("text")),
        )
        for i, c in enumerate(hn_cols)
    ]
    return F.filter(F.array(*structs), lambda s: s.isNotNull())


def headnotes_text(*hn_cols: Column | str) -> Column:
    """Rolling '~~' concat of present headnotes — except hn10, which the
    reference appends with a trailing space instead (ts:2713: quirk kept)."""
    pieces = []
    for i, c in enumerate(hn_cols):
        sep = " " if i == 9 else "~~"
        pieces.append(
            F.when(
                _c(c).isNotNull() & (_c(c).cast("string") != ""),
                F.concat(_c(c).cast("string"), F.lit(sep)),
            ).otherwise(F.lit(""))
        )
    return F.concat(*pieces)


def explode_digests(df: DataFrame, dtd_col: str = "DTDInfo") -> DataFrame:
    """J3 (ts:8421-8445): one case-law row → N digest docs. Parent metadata
    rides along; child supplies digest id (first '$' field before '@')."""
    exploded = df.withColumn(
        "digest_raw",
        F.explode(F.filter(F.split(F.col(dtd_col).cast("string"), "\\|"), lambda e: e != "")),
    )
    dtd = F.split(F.col("digest_raw"), "@")
    digest_id = F.trim(
        _ea(F.split(_ea(dtd, 1), "\\$"), 1)
    )
    return (
        exploded.withColumn("digest_id", digest_id)
        .withColumn("documenttype", F.lit("digest"))
    )


def tokenize_crosstagging(col: Column | str) -> Column:
    """F14 (ts:2825-2829): whitespace split, drop empties → wordphraseids."""
    return F.filter(F.split(_c(col).cast("string"), " "), lambda x: x != "")


# ---- MarkingInfo (ts:2626-2667) — the gnarly grammar, Arrow UDF ----------

MARKING_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("number", T.IntegerType()),
            T.StructField("text", T.StringType()),
            T.StructField("image", T.StringType()),
            T.StructField("entrydate", T.StringType()),
            T.StructField("updateddate", T.StringType()),
            T.StructField("parentmarking", T.StringType()),
            T.StructField("topstoryheading", T.StringType()),
            T.StructField("topstorydesc", T.StringType()),
        ]
    )
)


def parse_marking_info_str(
    raw: str | None,
    lower_text: bool = False,
    lower_parent: bool = True,
    comma_mode: str = "one",
) -> list[dict] | None:
    """Pure-Python MarkingInfo parser (grammar at ts:2643-2655):
    entries '$'-separated; entry = text|img^head##desc@@i…~entry\\updated_@@e…@@t…

    Mirrors the reference's exact split pyramid, including JS single-
    occurrence replace('&#39;') and replace('_',' ') semantics. Entries that
    raise in the reference would hit its per-row catch; here they yield None
    fields (quarantine-friendly).

    Per-doctype variants: ``lower_text`` lowercases the text field (the
    CirNot ts:4490 / Commentary ts:7054 / Book ts:7587 loops; CaseLaws
    ts:2637 and News ts:8250 keep it raw); ``lower_parent=False`` keeps
    parentmarking case (News ts:8274 — every other loop lowercases).

    ``comma_mode`` mirrors the three distinct leading-comma treatments of
    parentmarking across the reference loops:

    - ``"one"`` — CaseLaws ts:2654: ``.trim().replace(/^,/, '')`` — trim
      both ends FIRST, then strip exactly ONE leading comma (a residual
      leading space after the comma survives);
    - ``"all_trim"`` — CirNot ts:4513 / Article ts:5808:
      ``customTrimStart(x, ',').trim()`` — strip ALL leading commas from
      the raw join, THEN trim;
    - ``"all"`` — Commentary ts:7058 / Book ts:7601 / News ts:8274:
      strip ALL leading commas, no trim at all.
    """
    if not raw:
        return None
    out = []
    num = 0
    for entry in raw.split("$"):
        num += 1
        markings = entry.split("|")
        if len(markings) <= 1:
            continue
        m1 = markings[1].replace("&#39;", "'", 1)
        caret = m1.split("^")
        image = caret[0]
        rec = {
            "number": num,
            "text": markings[0].lower() if lower_text else markings[0],
            "image": image,
            "entrydate": None,
            "updateddate": None,
            "parentmarking": None,
            "topstoryheading": None,
            "topstorydesc": None,
        }
        try:
            after = caret[1]
            hash2 = after.split("##")
            if num == 1:
                rec["topstoryheading"] = hash2[0]
                rec["topstorydesc"] = hash2[1].split("@@i")[0]
            tail = hash2[1].split("@@i")[1].split("~")[1].split("\\")
            rec["entrydate"] = tail[0]
            upd = tail[1].replace("_", " ", 1).strip() if len(tail) > 1 else None
            if upd is not None:
                rec["updateddate"] = upd.split("@@e")[0]
            if "@@e" in m1 and upd is not None:
                pmark = upd.split("@@e")[1] if len(upd.split("@@e")) > 1 else ""
                if "@@t" in m1:
                    pm = pmark.split("@@t")
                    joined = pm[0] + ", " + (pm[1] if len(pm) > 1 else "")
                    if comma_mode == "one":
                        j = joined.strip()
                        pmv = j[1:] if j.startswith(",") else j
                    elif comma_mode == "all_trim":
                        pmv = joined.lstrip(",").strip()
                    else:  # "all"
                        pmv = joined.lstrip(",")
                    rec["parentmarking"] = pmv.lower() if lower_parent else pmv
        except (IndexError, AttributeError):
            pass
        out.append(rec)
    return out


@F.pandas_udf(MARKING_SCHEMA)
def parse_marking_info(col: pd.Series) -> pd.Series:
    return col.map(parse_marking_info_str)


@F.pandas_udf(MARKING_SCHEMA)
def parse_marking_info_lower(col: pd.Series) -> pd.Series:
    """CirNot/Article variant: text lowercased; parentmarking strips ALL
    leading commas then trims (customTrimStart(...).trim(), ts:4513/5808)."""
    return col.map(
        lambda v: parse_marking_info_str(v, lower_text=True, comma_mode="all_trim")
    )


@F.pandas_udf(MARKING_SCHEMA)
def parse_marking_info_lower_notrim(col: pd.Series) -> pd.Series:
    """Commentary/Book variant: text lowercased; parentmarking strips ALL
    leading commas with NO trim (ts:7058/7601)."""
    return col.map(
        lambda v: parse_marking_info_str(v, lower_text=True, comma_mode="all")
    )


@F.pandas_udf(MARKING_SCHEMA)
def parse_marking_info_news(col: pd.Series) -> pd.Series:
    """News variant: text raw AND parentmarking case preserved; ALL leading
    commas stripped, no trim (ts:8250,8274)."""
    return col.map(
        lambda v: parse_marking_info_str(v, lower_parent=False, comma_mode="all")
    )


# --- J2: intra-row semi-join — parent-section override --------------------


def _replace_first(col: Column, ch: str, repl: str) -> Column:
    """JS String.replace(str, str) semantics: first occurrence only."""
    pos = F.instr(col, ch)
    return F.when(
        pos > 0,
        F.concat(
            col.substr(F.lit(1), pos - 1),
            F.lit(repl),
            col.substr(pos + 1, F.length(col)),
        ),
    ).otherwise(col)


def parent_section_lookup(
    actid: Column | str, secid: Column | str, parent_info: Column | str
) -> Column:
    """J2 (solrIndexCreation.ts:1184-1200): scan the row's packed
    ``parentsectioninfo`` ('$'-separated entries) for an entry CONTAINING the
    section id (substring match, faithful to ``indexOf``); the LAST match
    wins (the reference's loop keeps overwriting). Returns
    struct{id, name, ordering, actsectionid} or null when no entry matches —
    an intra-row left-semi join between two packed arrays, no shuffle.

    Entry shape past its first '#': '#pid|pname^x~ordering'; id strips the
    leading '#', name/ordering split the second field on '~' after the
    first '^'→'-' rewrite (first occurrence only, JS replace semantics).
    """
    aid, sid, info = _c(actid), _c(secid), _c(parent_info)
    entries = F.split(info, r"\$")
    matches = F.filter(
        entries, lambda e: (F.instr(e, F.trim(sid)) > 0) & (F.trim(sid) != "")
    )
    m = F.try_element_at(matches, F.lit(-1))  # last match wins
    sub = m.substr(F.instr(m, "#"), F.length(m))
    parts = F.split(sub, r"\|")
    part0 = F.try_element_at(parts, F.lit(1))
    part1 = F.try_element_at(parts, F.lit(2))
    pid = F.trim(_replace_first(part0, "#", " "))
    p1r = _replace_first(part1, "^", "-")
    name = F.try_element_at(F.split(p1r, "~"), F.lit(1))
    ordering = F.try_element_at(F.split(p1r, "~"), F.lit(2))
    return F.when(
        m.isNotNull(),
        F.struct(
            pid.alias("id"),
            name.alias("name"),
            ordering.alias("ordering"),
            F.concat(F.trim(aid), pid).alias("actsectionid"),
        ),
    )


# --- F6 gnarly variant: arinfo ($$ / ^ / | / ## / @@ / ~) -----------------

from .scalars import ddmmyyyy_to_yyyymmdd  # noqa: E402


def parse_arinfo(col: Column | str) -> Column:
    """Affirm/reverse associations (solrIndexCreation.ts:4146-4189):

    arinfo = assoc '$$' assoc …
    assoc  = id '|' type '^' name '##' rest
    rest   = date '@@' subheading '~' associatedDocid     (date: dd-mm-yyyy)

    → array<struct{id, type, name, date(yyyymmdd), subheading,
    associatedDocid, url(slug of name)}>. Elements without a '|' in the
    first field or an empty type are dropped (the reference requires
    idtype[1]); without '##' the name/date fields degrade to '' exactly as
    the row loop's ternaries do. Pure Catalyst higher-order functions.
    """
    elems = F.filter(
        F.split(_c(col), r"\$\$"), lambda e: e != ""
    )

    def build(e: Column):
        caret = F.split(e, r"\^")
        first = F.try_element_at(caret, F.lit(1))
        second = F.try_element_at(caret, F.lit(2))
        idtype = F.when(F.instr(first, "|") > 0, F.split(first, r"\|"))
        namedate = F.when(
            F.instr(second, "##") > 0,
            F.filter(F.split(second, "##"), lambda x: x != ""),
        )
        aid = F.trim(F.try_element_at(idtype, F.lit(1)))
        atype = F.try_element_at(idtype, F.lit(2))
        name = F.coalesce(F.try_element_at(namedate, F.lit(1)), F.lit(""))
        rest = F.try_element_at(namedate, F.lit(2))
        has_at = F.instr(rest, "@@") > 0
        atparts = F.filter(F.split(rest, "@@"), lambda x: x != "")
        date = F.when(
            has_at, ddmmyyyy_to_yyyymmdd(F.try_element_at(atparts, F.lit(1)))
        ).otherwise(F.lit(""))
        tail = F.split(F.try_element_at(atparts, F.lit(2)), "~")
        sub = F.when(has_at, F.try_element_at(tail, F.lit(1))).otherwise(F.lit(""))
        docid = F.when(has_at, F.try_element_at(tail, F.lit(2))).otherwise(F.lit(""))
        return F.struct(
            aid.alias("id"),
            atype.alias("type"),
            name.alias("name"),
            date.alias("date"),
            sub.alias("subheading"),
            docid.alias("associatedDocid"),
            slugify(F.lower(name)).alias("url"),
        )

    built = F.transform(elems, build)
    return F.filter(
        built,
        lambda s: s["type"].isNotNull() & (s["type"] != ""),
    )
