"""masterinfo / associates grammars — the Info facet structs, the iltinfo
country/article/subject tree, the casereferred/arinfo/slpinfo associate
grammars, and the AuthorName ``@``-grammar.

Reference sites (re-expressed, not ported):
- GSTSubjectID classification/subclassification  solrIndexCreation.ts:1953-2031
- court / bench / benchtype / infavourof /
  ServiceInfo facet structs                      solrIndexCreation.ts:2033-2131
- AAAAssociation → accountingstandard / indas    solrIndexCreation.ts:2133-2178
- casereferred associates                        solrIndexCreation.ts:1414-1460
- arinfo (CaseLaws single-$ variant)             solrIndexCreation.ts:1466-1524
- slpinfo associates                             solrIndexCreation.ts:1528-1563
- DDA_CirNot associates                          solrIndexCreation.ts:1566-1594
- iltassociation tree + searchiltcitation        solrIndexCreation.ts:2333-2583
- AuthorName @-grammar                           solrIndexCreation.ts:5234-5262

All pure Catalyst (split / transform / filter / try_element_at); the
delimiter grammar is the reference's de-facto type system ('$' list, '|'
fields, '^' id/name, '#' name/ordering, '@' blocks, '%'/'~'/'-' leaves).
GenericInfo / iltinfo structs carry the reference's field set; absent
pieces default to '' exactly as the row-loop ternaries do.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scalars import ddmmyyyy_to_yyyymmdd, slugify


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _f(parts: Column, i: int) -> Column:
    return F.try_element_at(parts, F.lit(i))


def _e(col: Column) -> Column:
    return F.coalesce(col, F.lit(""))


def generic_info(
    id_: Column,
    name: Column,
    type_: str,
    short: Column | None = None,
    ordering: Column | None = None,
    order_int: Column | None = None,
    url_of: Column | None = None,
) -> Column:
    """The GenericInfo struct (indexDocument.ts:314 region): id, type,
    name, shortName, ordering, orderInteger, url(slug)."""
    name = _e(name)
    url_src = url_of if url_of is not None else F.lower(name)
    return F.struct(
        _e(id_).alias("id"),
        F.lit(type_).alias("type"),
        _e(short if short is not None else name).alias("shortName"),
        _e(ordering if ordering is not None else F.lit("")).alias("ordering"),
        (
            order_int if order_int is not None else F.lit(None).cast("int")
        ).alias("orderInteger"),
        name.alias("name"),
        slugify(url_src).alias("url"),
    )


# --- court / bench / benchtype / infavour / service (ts:2033-2131) ---------


def parse_court(col: Column | str) -> Column:
    """court = id^shortName^name^ordering → array<GenericInfo> (0/1 elems;
    requires ≥2 fields and non-empty id, ts:2035-2043)."""
    p = F.split(_c(col), r"\^")
    ok = (F.size(p) > 1) & (F.trim(_e(_f(p, 1))) != "")
    info = generic_info(
        F.trim(_f(p, 1)), F.trim(_f(p, 3)), "court",
        short=F.trim(_f(p, 2)), ordering=F.trim(_f(p, 4)),
    )
    return F.when(ok, F.array(info)).otherwise(F.array().cast(f"array<{info_ddl()}>"))


def parse_bench(col: Column | str) -> Column:
    """bench = id^shortName^name (ordering always '', ts:2054-2062)."""
    p = F.split(_c(col), r"\^")
    ok = (F.size(p) > 1) & (F.trim(_e(_f(p, 1))) != "")
    info = generic_info(
        F.trim(_f(p, 1)), F.trim(_f(p, 3)), "bench", short=F.trim(_f(p, 2))
    )
    return F.when(ok, F.array(info)).otherwise(F.array().cast(f"array<{info_ddl()}>"))


def parse_benchtype(col: Column | str) -> Column:
    """benchtype: same shape as bench but gated on an 18-digit-looking id
    (``benchTypeInfo[0].length > 12``, ts:2075-2083)."""
    p = F.split(_c(col), r"\^")
    ok = (
        (F.size(p) > 1)
        & (F.length(_e(_f(p, 1))) > 12)
        & (F.trim(_e(_f(p, 1))) != "")
    )
    info = generic_info(
        F.trim(_f(p, 1)), F.trim(_f(p, 3)), "benchtype", short=F.trim(_f(p, 2))
    )
    return F.when(ok, F.array(info)).otherwise(F.array().cast(f"array<{info_ddl()}>"))


def parse_infavourof(col: Column | str) -> Column:
    """InfavourofText = id^name ('|'-list, ts:2096-2113)."""
    c = _c(col)
    elems = F.split(c, r"\|")
    built = F.transform(
        elems,
        lambda e: generic_info(
            _f(F.split(e, r"\^"), 1), _f(F.split(e, r"\^"), 2), "infavourof",
            short=F.lit(""),
        ),
    )
    return F.when(
        c.isNotNull() & (c != ""), built
    ).otherwise(F.array().cast(f"array<{info_ddl()}>"))


def parse_serviceinfo(col: Column | str) -> Column:
    """ServiceInfo: '$|' collapsed to ' ', then '|' fields
    id|?|name|orderInteger (ts:2115-2131)."""
    c = F.regexp_replace(_c(col).cast("string"), r"\$\|", " ")
    p = F.split(c, r"\|")
    ok = (F.size(p) > 1) & (F.trim(_e(_f(p, 1))) != "")
    name = F.trim(_f(p, 3))
    info = generic_info(
        F.trim(_f(p, 1)), name, "service", short=name,
        ordering=F.lower(name),
        order_int=F.trim(_f(p, 4)).try_cast("int"),
    )
    return F.when(ok, F.array(info)).otherwise(F.array().cast(f"array<{info_ddl()}>"))


def info_ddl() -> str:
    """DDL of the GenericInfo struct (for empty-array casts)."""
    return (
        "struct<id:string,type:string,shortName:string,ordering:string,"
        "orderInteger:int,name:string,url:string>"
    )


# --- GSTSubjectID classifications (ts:1953-2031) ---------------------------

GST_CLASSIFICATION_CATEGORY = "111050000000016981"


def parse_gst_subjects(
    gst_col: Column | str, categories_col: Column | str
) -> Column:
    """GSTSubjectID ('$'-list of ``classification|subclassification``,
    each ``id^name``) → struct{classification: array<GenericInfo>,
    subclassification: array<GenericInfo>} with the reference's first-wins
    dedup and the synthesized "Classification of Subject" parent for
    GST-classified rows (ts:1953-2031).

    The special branch (``sub.length < 10 && main.length > 10 &&
    categories contains GST id``) emits the synthetic parent once and
    treats field0 as the SUBclassification — quirk kept.
    """
    g = _c(gst_col)
    cats = _e(_c(categories_col).cast("string"))
    elems = F.filter(F.split(g, r"\$"), lambda e: e != "")

    def fields(e: Column):
        p = F.split(e, r"\|")
        return _f(p, 1), _f(p, 2)

    is_gst = cats.contains(GST_CLASSIFICATION_CATEGORY)

    def special(e: Column) -> Column:
        f0, f1 = fields(e)
        return (
            is_gst
            & (F.length(_e(f1)) < 10)
            & (F.length(_e(f0)) > 10)
        )

    # classifications: special → synthetic parent; normal → field0 id^name
    def class_of(e: Column) -> Column:
        f0, _ = fields(e)
        idname = F.split(f0, r"\^")
        return F.when(
            special(e),
            generic_info(
                F.lit("000000000000000000"),
                F.lit("Classification of Subject"),
                "classification",
            ),
        ).otherwise(
            generic_info(
                F.trim(_f(idname, 1)), F.trim(_e(_f(idname, 2))),
                "classification",
                ordering=_f(idname, 2),
            )
        )

    def subclass_of(e: Column) -> Column:
        f0, f1 = fields(e)
        sub_src = F.when(special(e), f0).otherwise(f1)
        idname = F.split(sub_src, r"\^")
        present = F.when(special(e), F.lit(True)).otherwise(
            F.length(_e(f1)) > 5
        )
        return F.when(
            present,
            generic_info(
                F.trim(_f(idname, 1)), _f(idname, 2), "subclassification",
                ordering=_f(idname, 2),
            ),
        ).otherwise(
            generic_info(F.lit(""), F.lit(""), "subclassification",
                         short=F.lit(""), url_of=F.lit(""))
        )

    classes = F.transform(elems, class_of)
    subclasses = F.transform(elems, subclass_of)
    # first-wins dedup by id over the classification array (ts:1991-1993)
    deduped = F.filter(
        classes,
        lambda x, i: ~F.exists(
            F.slice(classes, F.lit(1), i), lambda y: y["id"] == x["id"]
        ),
    )
    has = g.isNotNull() & g.contains("$")
    empty = F.array().cast(f"array<{info_ddl()}>")
    return F.struct(
        F.when(has, deduped).otherwise(empty).alias("classification"),
        F.when(has, subclasses).otherwise(empty).alias("subclassification"),
    )


# --- AAAAssociation → accountingstandard / indas (ts:2133-2178) ------------


def parse_aaa_association(col: Column | str) -> Column:
    """AAAAssociation '$'-list; element = ``id|type^name#order~year``;
    routed by type into accountingstandard / indas arrays."""
    elems = F.filter(F.split(_c(col), r"\$"), lambda e: e != "")

    def build(e: Column) -> Column:
        caret = F.split(e, r"\^")
        first, second = _f(caret, 1), _f(caret, 2)
        idp = F.split(first, r"\|")
        typ = F.lower(F.trim(_e(_f(idp, 2))))
        name = F.trim(_f(F.split(second, "#"), 1))
        tail = _f(F.split(second, "#"), 2)
        order_int = F.trim(_f(F.split(tail, "~"), 1)).try_cast("int")
        year = F.trim(_f(F.split(tail, "~"), 2))
        short = F.trim(_f(F.split(name, ":"), 1))
        return F.struct(
            typ.alias("_type"),
            F.struct(
                F.trim(_f(idp, 1)).alias("id"),
                F.lit("").alias("type"),  # filled below per route
                _e(short).alias("shortName"),
                F.lower(_e(short)).alias("ordering"),
                order_int.alias("orderInteger"),
                _e(name).alias("name"),
                slugify(F.lower(_e(short))).alias("url"),
            ).alias("info"),
        )

    built = F.transform(elems, build)

    def route(kind: str, tag: str) -> Column:
        return F.transform(
            F.filter(built, lambda s: s["_type"] == kind),
            lambda s: F.struct(
                s["info"]["id"].alias("id"),
                F.lit(tag).alias("type"),
                s["info"]["shortName"].alias("shortName"),
                s["info"]["ordering"].alias("ordering"),
                s["info"]["orderInteger"].alias("orderInteger"),
                s["info"]["name"].alias("name"),
                s["info"]["url"].alias("url"),
            ),
        )

    return F.struct(
        route("account standard", "accountingstandard").alias(
            "accountingstandard"
        ),
        route("ind as", "indas").alias("indas"),
    )


# --- associates: casereferred / arinfo / slpinfo / cirnot ------------------

_ASSOC_DDL = (
    "struct<id:string,type:string,name:string,date:string,"
    "courtshortname:string,subheading:string,associatedDocid:string,"
    "url:string>"
)


def _assoc(
    id_: Column, type_: Column, name: Column, date: Column,
    courtshort: Column, subheading: Column, docid: Column,
) -> Column:
    name = _e(name)
    return F.struct(
        _e(id_).alias("id"),
        _e(type_).alias("type"),
        name.alias("name"),
        _e(date).alias("date"),
        _e(courtshort).alias("courtshortname"),
        _e(subheading).alias("subheading"),
        _e(docid).alias("associatedDocid"),
        slugify(F.lower(name)).alias("url"),
    )


def parse_casereferred(col: Column | str, mid: Column | str) -> Column:
    """casereferred = '$'-list of ``id|type^name#date@sub%court``
    (ts:1414-1460): date dd-mm-yyyy → yyyymmdd; the '@' block splits into
    subheading%courtshortname; associatedDocid is the parent's mid."""
    c = _c(col)
    elems = F.split(c, r"\$")

    def build(e: Column) -> Column:
        caret = F.split(e, r"\^")
        first, second = _f(caret, 1), _f(caret, 2)
        idtype = F.split(F.trim(first), r"\|")
        namedate = F.split(second, "#")
        name = _f(namedate, 1)
        rest = _f(namedate, 2)
        has_at = F.instr(_e(rest), "@") > 0
        date = F.when(
            has_at, ddmmyyyy_to_yyyymmdd(_f(F.split(rest, "@"), 1))
        ).otherwise(F.lit(""))
        atblock = _f(F.split(rest, "@"), 2)
        court = F.when(has_at, _f(F.split(atblock, "%"), 2)).otherwise(F.lit(""))
        sub = F.when(has_at, _f(F.split(atblock, "%"), 1)).otherwise(F.lit(""))
        return _assoc(
            _f(idtype, 1), _f(idtype, 2), name, date, court, sub, _c(mid)
        )

    built = F.transform(elems, build)
    kept = F.filter(
        built, lambda s: s["type"].isNotNull() & (s["type"] != "")
    )
    ok = c.isNotNull() & (c != "") & (F.size(elems) > 1)
    return F.when(ok, kept).otherwise(F.array().cast(f"array<{_ASSOC_DDL}>"))


def parse_arinfo_caselaw(col: Column | str) -> Column:
    """CaseLaws arinfo variant (ts:1466-1524) — single-'$' list,
    ``id|type^name#date%court@sub~docid``. (The CirNot '$$'-variant lives
    in grammars.parse_arinfo.)"""
    c = _c(col)
    elems = F.filter(F.split(c, r"\$"), lambda e: e != "")

    def build(e: Column) -> Column:
        caret = F.split(e, r"\^")
        first, second = _f(caret, 1), _f(caret, 2)
        idtype = F.split(F.trim(first), r"\|")
        namedate = F.split(second, "#")
        name = _f(namedate, 1)
        rest = _f(namedate, 2)
        has_at = F.instr(_e(rest), "@") > 0
        before_at = _f(F.split(rest, "@"), 1)
        after_at = _f(F.split(rest, "@"), 2)
        date = F.when(
            has_at, ddmmyyyy_to_yyyymmdd(_f(F.split(before_at, "%"), 1))
        ).otherwise(F.lit(""))
        court = F.when(has_at, _f(F.split(before_at, "%"), 2)).otherwise(
            F.lit("")
        )
        sub = F.when(has_at, _f(F.split(after_at, "~"), 1)).otherwise(F.lit(""))
        docid = F.when(has_at, _f(F.split(after_at, "~"), 2)).otherwise(
            F.lit("")
        )
        return _assoc(
            F.trim(_f(idtype, 1)), _f(idtype, 2), name, date, court, sub, docid
        )

    built = F.transform(elems, build)
    kept = F.filter(
        built, lambda s: s["type"].isNotNull() & (s["type"] != "")
    )
    ok = c.isNotNull() & (F.size(F.split(c, r"\$")) > 1)
    return F.when(ok, kept).otherwise(F.array().cast(f"array<{_ASSOC_DDL}>"))


def parse_slpinfo(col: Column | str) -> Column:
    """slpinfo = '$'-list of ``type|subheading^id@docid`` (ts:1528-1563);
    name == type in the reference (quirk kept)."""
    c = _c(col)
    elems = F.split(c, r"\$")

    def build(e: Column) -> Column:
        caret = F.split(e, r"\^")
        first, second = _f(caret, 1), _f(caret, 2)
        namesub = F.split(F.trim(first), r"\|")
        ids = F.split(second, "@")
        return _assoc(
            _f(ids, 1), _f(namesub, 1), _f(namesub, 1), F.lit(""),
            F.lit(""), _f(namesub, 2), _f(ids, 2),
        )

    built = F.transform(elems, build)
    kept = F.filter(
        built, lambda s: s["subheading"].isNotNull() & (s["subheading"] != "")
    )
    ok = c.isNotNull() & (c != "") & (F.size(elems) > 1)
    return F.when(ok, kept).otherwise(F.array().cast(f"array<{_ASSOC_DDL}>"))


def parse_cirnot_assoc(col: Column | str) -> Column:
    """DDA_CirNot = '$'-list of ``id|type^name^date^subheading``
    (ts:1566-1594)."""
    c = _c(col)
    elems = F.split(c, r"\$")

    def build(e: Column) -> Column:
        p = F.split(e, r"\|")
        second = _f(p, 2)
        caret = F.split(second, r"\^")
        return _assoc(
            F.trim(_f(p, 1)),
            F.lower(F.trim(_f(caret, 1))),
            F.trim(_f(caret, 2)),
            F.trim(_f(caret, 3)),
            F.lit(""),
            F.trim(_f(caret, 4)),
            F.lit(""),
        )

    built = F.transform(
        F.filter(elems, lambda e: F.instr(e, "|") > 0), build
    )
    ok = c.isNotNull() & (F.trim(c) != "") & (F.size(elems) > 1)
    return F.when(ok, built).otherwise(F.array().cast(f"array<{_ASSOC_DDL}>"))


# --- iltinfo tree (ts:2333-2583) -------------------------------------------

_ILT_DDL = (
    "struct<id:string,pid:string,pSubId:string,type:string,name:string,"
    "shortName:string,ordering:string,orderInteger:int,url:string>"
)


def _ilt(
    id_: Column, pid: Column, psub: Column, type_: str, name: Column,
    ordering: Column, order_int: Column | None = None,
) -> Column:
    name = _e(name)
    return F.struct(
        _e(id_).alias("id"),
        _e(pid).alias("pid"),
        _e(psub).alias("pSubId"),
        F.lit(type_).alias("type"),
        name.alias("name"),
        F.lit("").alias("shortName"),
        _e(ordering).alias("ordering"),
        (order_int if order_int is not None else F.lit(0)).alias(
            "orderInteger"
        ),
        slugify(name).alias("url"),
    )


def _ilt_empty(type_: str) -> Column:
    return _ilt(
        F.lit(""), F.lit(""), F.lit(""), type_, F.lit(""), F.lit("")
    )


def parse_iltinfo(col: Column | str) -> Column:
    """iltassociation → array of {country1, country2, article, subject,
    subsubject} iltinfo trees (ts:2340-2563).

    Element grammar (5 '|' fields): each field ``id^name``; country names
    may carry ``#ordering`` (orderInteger = Number(ordering)); subject id
    may carry ``-pSubId``; country2/article/subject/subsubject require
    field length > 5 else empty struct; article/subject pid =
    country1.id + country2.id; subsubject.pid = subject.id. The non-'$'
    single form is a one-element list (same per-element semantics).
    """
    c = _c(col)
    elems = F.split(c, r"\$")

    def build(e: Column) -> Column:
        p = F.split(e, r"\|")
        f0, f1, f2, f3, f4 = (_f(p, i) for i in range(1, 6))

        def idname(f: Column):
            cr = F.split(f, r"\^")
            return _f(cr, 1), _f(cr, 2)

        def name_ord(nm: Column):
            has = F.instr(_e(nm), "#") > 0
            return (
                F.when(has, _f(F.split(nm, "#"), 1)).otherwise(nm),
                F.when(has, _f(F.split(nm, "#"), 2)).otherwise(nm),
                F.when(
                    has, _f(F.split(nm, "#"), 2).try_cast("double")
                    .try_cast("int")
                ).otherwise(F.lit(0)),
            )

        c1_id, c1_nm = idname(f0)
        c1_name, c1_ord, c1_oi = name_ord(c1_nm)
        country1 = F.when(
            f0.isNotNull() & (f0 != ""),
            _ilt(c1_id, F.lit(""), F.lit(""), "country1", c1_name, c1_ord,
                 F.coalesce(c1_oi, F.lit(0))),
        ).otherwise(_ilt_empty("country1"))

        c2_id, c2_nm = idname(f1)
        c2_name, c2_ord, c2_oi = name_ord(c2_nm)
        country2 = F.when(
            f1.isNotNull() & (F.length(f1) > 5),
            _ilt(c2_id, c1_id, F.lit(""), "country2", c2_name, c2_ord,
                 F.coalesce(c2_oi, F.lit(0))),
        ).otherwise(_ilt_empty("country2"))

        a_id, a_nm = idname(f2)
        # article quirk: the '#' test is on the WHOLE field, the split on
        # the name part; ordering '' when no '#' (ts:2392-2396)
        a_has = F.instr(_e(f2), "#") > 0
        a_name = F.when(a_has, _f(F.split(a_nm, "#"), 1)).otherwise(a_nm)
        a_ord = F.when(a_has, _f(F.split(a_nm, "#"), 2)).otherwise(F.lit(""))
        article = F.when(
            f2.isNotNull() & (F.length(f2) > 5),
            _ilt(
                a_id,
                F.when(
                    c1_id.isNotNull() & (c1_id != ""),
                    F.concat(_e(c1_id), _e(F.when(
                        f1.isNotNull() & (F.length(f1) > 5), c2_id
                    ).otherwise(F.lit("")))),
                ).otherwise(F.lit("")),
                F.lit(""), "article", a_name, a_ord,
            ),
        ).otherwise(_ilt_empty("article"))

        s_idraw, s_nm = idname(f3)
        s_has_dash = F.instr(_e(s_idraw), "-") > 0
        s_id = F.when(
            s_has_dash, _f(F.split(s_idraw, "-"), 1)
        ).otherwise(s_idraw)
        s_psub = F.when(
            s_has_dash, _f(F.split(s_idraw, "-"), 2)
        ).otherwise(F.lit(""))
        subject = F.when(
            f3.isNotNull() & (F.length(f3) > 5),
            _ilt(
                s_id,
                F.when(
                    c1_id.isNotNull() & (c1_id != ""),
                    F.concat(_e(c1_id), _e(F.when(
                        f1.isNotNull() & (F.length(f1) > 5), c2_id
                    ).otherwise(F.lit("")))),
                ).otherwise(F.lit("")),
                s_psub, "subject", s_nm, F.lower(_e(s_nm)),
            ),
        ).otherwise(_ilt_empty("subject"))

        ss_id, ss_nm = idname(f4)
        subsubject = F.when(
            f4.isNotNull() & (F.length(f4) > 5),
            _ilt(
                ss_id,
                F.when(
                    f3.isNotNull() & (F.length(f3) > 5), s_id
                ).otherwise(F.lit("")),
                F.lit(""), "subsubject", ss_nm, F.lower(_e(ss_nm)),
            ),
        ).otherwise(_ilt_empty("subsubject"))

        return F.struct(
            country1.alias("country1"),
            country2.alias("country2"),
            article.alias("article"),
            subject.alias("subject"),
            subsubject.alias("subsubject"),
        )

    built = F.transform(elems, build)
    return F.when(c.isNotNull() & (c != ""), built).otherwise(
        F.array().cast(
            "array<struct<country1:%(i)s,country2:%(i)s,article:%(i)s,"
            "subject:%(i)s,subsubject:%(i)s>>" % {"i": _ILT_DDL}
        )
    )


def parse_iltinfo_cirnot(col: Column | str) -> Column:
    """CirNot iltinfo variant (ts:4275-4473) → struct{trees, names}.

    Differs from the CaseLaws ``parse_iltinfo``:
    - no '#ordering' suffix handling — ordering is name.toLowerCase();
    - no '-pSubId' on subject ids;
    - in the '$'-list branch, empty country2/article/subject/subsubject
      default to id ``'000000000000000000'`` and filled pids
      (article/subject pid = c1.id+c2.id including the default id,
      subsubject pid = subject.id);
    - a non-'$' input builds ONE tree with ``''`` defaults and NO pid on
      article/subject (ts:4414-4436) — even an empty string yields one
      all-empty tree (JS ``''.split('|')`` → ['']);
    - a NULL column takes the '$' branch with no entries (JS
      ``undefined?.indexOf`` → undefined ≠ -1) → empty arrays;
    - searchiltcitation names concat the five ids for EVERY tree (no
      non-empty-country1 filter, ts:4373,4463).
    """
    c = _c(col)
    ZERO = "000000000000000000"

    def build(e: Column, dollar: bool) -> Column:
        p = F.split(e, r"\|")
        f0, f1, f2, f3, f4 = (_f(p, i) for i in range(1, 6))

        def idname(f: Column):
            cr = F.split(f, r"\^")
            return _e(_f(cr, 1)), _e(_f(cr, 2))

        def filled(f: Column, id_: Column, pid: Column, typ: str,
                   name: Column) -> Column:
            return F.when(
                F.length(_e(f)) > 5,
                _ilt(id_, pid, F.lit(""), typ, name, F.lower(name)),
            )

        c1_id, c1_name = idname(f0)
        country1 = _ilt(
            c1_id, F.lit(""), F.lit(""), "country1", c1_name,
            F.lower(c1_name),
        )
        c2_id, c2_name = idname(f1)
        c2_def_id = F.lit(ZERO) if dollar else F.lit("")
        c2_eff = F.when(F.length(_e(f1)) > 5, c2_id).otherwise(c2_def_id)
        country2 = F.coalesce(
            filled(f1, c2_id, c1_id, "country2", c2_name),
            _ilt(c2_def_id, c1_id if dollar else F.lit(""), F.lit(""),
                 "country2", F.lit(""), F.lit("")),
        )
        a_id, a_name = idname(f2)
        s_id, s_name = idname(f3)
        ss_id, ss_name = idname(f4)
        if dollar:
            c12 = F.concat(c1_id, c2_eff)
            article = F.coalesce(
                filled(f2, a_id, c12, "article", a_name),
                _ilt(F.lit(ZERO), c12, F.lit(""), "article", F.lit(""),
                     F.lit("")),
            )
            subject = F.coalesce(
                filled(f3, s_id, c12, "subject", s_name),
                _ilt(F.lit(ZERO), c12, F.lit(""), "subject", F.lit(""),
                     F.lit("")),
            )
            s_eff = F.when(F.length(_e(f3)) > 5, s_id).otherwise(F.lit(ZERO))
            subsubject = F.coalesce(
                filled(f4, ss_id, s_eff, "subsubject", ss_name),
                _ilt(F.lit(ZERO), s_eff, F.lit(""), "subsubject", F.lit(""),
                     F.lit("")),
            )
        else:
            article = F.coalesce(
                filled(f2, a_id, F.lit(""), "article", a_name),
                _ilt_empty("article"),
            )
            subject = F.coalesce(
                filled(f3, s_id, F.lit(""), "subject", s_name),
                _ilt_empty("subject"),
            )
            s_eff = F.when(F.length(_e(f3)) > 5, s_id).otherwise(F.lit(""))
            subsubject = F.coalesce(
                filled(f4, ss_id, s_eff, "subsubject", ss_name),
                _ilt_empty("subsubject"),
            )
        return F.struct(
            country1.alias("country1"), country2.alias("country2"),
            article.alias("article"), subject.alias("subject"),
            subsubject.alias("subsubject"),
        )

    dollar_trees = F.when(
        c.isNotNull(), F.transform(F.split(c, r"\$"), lambda e: build(e, True))
    ).otherwise(
        F.array().cast(
            "array<struct<country1:%(i)s,country2:%(i)s,article:%(i)s,"
            "subject:%(i)s,subsubject:%(i)s>>" % {"i": _ILT_DDL}
        )
    )
    single_tree = F.array(build(F.coalesce(c, F.lit("")), False))
    trees = F.when(
        c.isNull() | (F.instr(c, "$") > 0), dollar_trees
    ).otherwise(single_tree)
    names = F.transform(
        trees,
        lambda t: F.concat(
            t["country1"]["id"], t["country2"]["id"], t["article"]["id"],
            t["subject"]["id"], t["subsubject"]["id"],
        ),
    )
    return F.struct(trees.alias("trees"), names.alias("names"))


def parse_aaa_standards(col: Column | str) -> Column:
    """Article AAAAssociation variant (ts:5194-5232) → struct{standards,
    substandards}. Element = ``subid|subname@groupid~groupname#order:year``:
    standards from the '~' group block (name before '#'), substandards from
    the '|' block with pid = group id, ordering/orderInteger/year from the
    '#order:year' tail. Null column → struct of nulls (the reference leaves
    the fields unassigned)."""
    c = _c(col)
    elems = F.filter(F.split(c, r"\$"), lambda e: e != "")

    def group_parts(e: Column):
        at = F.split(e, "@")
        groupinfo = F.split(_f(at, 2), "~")
        standard = F.split(_f(at, 1), r"\|")
        gid = F.trim(_e(_f(groupinfo, 1)))
        gname_blk = _e(_f(groupinfo, 2))
        gname = F.trim(_e(_f(F.split(gname_blk, "#"), 1)))
        tail = _f(F.split(gname_blk, "#"), 2)
        return gid, gname, tail, standard

    def ok(e: Column) -> Column:
        at = F.split(e, "@")
        standard = F.split(_f(at, 1), r"\|")
        return _e(_f(standard, 1)) != ""

    kept = F.filter(elems, ok)

    def std(e: Column) -> Column:
        gid, gname, _tail, _standard = group_parts(e)
        return F.struct(
            gid.alias("id"),
            F.lit("standards").alias("type"),
            gname.alias("name"),
            gname.alias("shortName"),
            F.lower(gname).alias("ordering"),
            slugify(F.lower(gname)).alias("url"),
        )

    def sub(e: Column) -> Column:
        gid, _gname, tail, standard = group_parts(e)
        name = F.regexp_replace(
            F.trim(_e(_f(standard, 2))), r"\^", "-"
        )
        ordering = F.coalesce(_f(F.split(tail, ":"), 1), F.lit("0"))
        year = F.coalesce(_f(F.split(tail, ":"), 2), F.lit(""))
        return F.struct(
            F.trim(_e(_f(standard, 1))).alias("id"),
            gid.alias("pid"),
            F.lit("substandards").alias("type"),
            name.alias("name"),
            name.alias("shortName"),
            ordering.alias("ordering"),
            F.coalesce(
                _f(F.split(tail, ":"), 1).try_cast("int"), F.lit(0)
            ).alias("orderInteger"),
            year.alias("year"),
            slugify(F.lower(name)).alias("url"),
        )

    return F.when(
        c.isNotNull(),
        F.struct(
            F.transform(kept, std).alias("standards"),
            F.transform(kept, sub).alias("substandards"),
        ),
    )


def parse_aaa_standards_commentary(col: Column | str) -> Column:
    """Commentary AAAAssociation variant (ts:6647-6692) → struct{standards,
    substandards}. Like the Article variant but: standards DEDUP on group
    id (first wins); no '#ordering'/year parsing (ordering = lowercase
    name, orderInteger 0); substandard url slugs the PRE-'^' text of the
    sub name. Null column → struct of nulls."""
    c = _c(col)
    elems = F.filter(F.split(c, r"\$"), lambda e: e != "")

    def parts(e: Column):
        at = F.split(e, "@")
        groupinfo = F.split(_f(at, 2), "~")
        standard = F.split(_f(at, 1), r"\|")
        return (
            _e(_f(groupinfo, 1)),
            _e(_f(groupinfo, 2)),
            standard,
        )

    kept = F.filter(elems, lambda e: _e(_f(F.split(_f(F.split(e, "@"), 1), r"\|"), 1)) != "")
    gids = F.transform(kept, lambda e: parts(e)[0])

    def std(e: Column, i: Column) -> Column:
        gid, gname, _s_ = parts(e)
        # dedup: keep only the FIRST element carrying this group id
        first_idx = F.array_position(gids, gid)
        return F.when(
            first_idx == i,
            F.struct(
                gid.alias("id"),
                F.lit("standards").alias("type"),
                gname.alias("name"),
                gname.alias("shortName"),
                F.lower(gname).alias("ordering"),
                F.lit(0).alias("orderInteger"),
                slugify(F.lower(gname)).alias("url"),
            ),
        )

    def sub(e: Column) -> Column:
        gid, _g, standard = parts(e)
        raw = F.trim(_e(_f(standard, 2)))
        name = F.regexp_replace(raw, r"\^", "-")
        return F.struct(
            F.trim(_e(_f(standard, 1))).alias("id"),
            gid.alias("pid"),
            F.lit("substandards").alias("type"),
            name.alias("name"),
            name.alias("shortName"),
            F.lower(name).alias("ordering"),
            F.lit(0).alias("orderInteger"),
            slugify(_e(_f(F.split(raw, r"\^"), 1))).alias("url"),
        )

    stds = F.filter(
        F.zip_with(
            kept,
            F.sequence(F.lit(1), F.greatest(F.size(kept), F.lit(1))),
            lambda e, i: std(e, i),
        ),
        lambda s: s.isNotNull(),
    )
    return F.when(
        c.isNotNull(),
        F.struct(
            stds.alias("standards"),
            F.transform(kept, sub).alias("substandards"),
        ),
    )


def parse_iltinfo_article(col: Column | str) -> Column:
    """Article iltassociation variant (ts:5516-5730) → struct{trees,
    names}. Per-element parsing matches the CaseLaws grammar ('#'
    name-ordering on countries, '-pSubId' on subject in the '$' branch)
    but with the CirNot-style branching: '$'-list entries default empty
    sub-fields to id ``'000000000000000000'`` with pids filled; a
    non-'$' input (including empty — but NOT null, which takes the '$'
    branch with no entries... the reference would crash on null; we treat
    null as no entries) builds ONE tree with '' defaults, no pid on
    article, pid only on filled subject; names concat the five ids for
    every tree."""
    c = _c(col)
    ZERO = "000000000000000000"

    def build(e: Column, dollar: bool) -> Column:
        p = F.split(e, r"\|")
        f0, f1, f2, f3, f4 = (_f(p, i) for i in range(1, 6))

        def idname(f: Column):
            cr = F.split(f, r"\^")
            return _e(_f(cr, 1)), _f(cr, 2)

        def name_ord(nm: Column):
            has = F.instr(_e(nm), "#") > 0
            return (
                F.when(has, _f(F.split(nm, "#"), 1)).otherwise(nm),
                F.when(has, _f(F.split(nm, "#"), 2)).otherwise(nm),
                F.coalesce(
                    F.when(
                        has,
                        _f(F.split(nm, "#"), 2).try_cast("double")
                        .try_cast("int"),
                    ).otherwise(F.lit(0)),
                    F.lit(0),
                ),
            )

        c1_id, c1_nm = idname(f0)
        c1_name, c1_ord, c1_oi = name_ord(c1_nm)
        country1 = _ilt(
            c1_id, F.lit(""), F.lit(""), "country1", c1_name, c1_ord, c1_oi
        )
        c2_id, c2_nm = idname(f1)
        c2_name, c2_ord, c2_oi = name_ord(c2_nm)
        c2_def = F.lit(ZERO) if dollar else F.lit("")
        c2_eff = F.when(F.length(_e(f1)) > 5, c2_id).otherwise(c2_def)
        country2 = F.when(
            F.length(_e(f1)) > 5,
            _ilt(c2_id, c1_id, F.lit(""), "country2", c2_name, c2_ord,
                 c2_oi),
        ).otherwise(
            _ilt(c2_def, c1_id if dollar else F.lit(""), F.lit(""),
                 "country2", F.lit(""), F.lit(""))
        )
        # article: the '#' test is on the WHOLE field (ts:5566)
        a_id, a_nm = idname(f2)
        a_has = F.instr(_e(f2), "#") > 0
        a_name = F.when(a_has, _f(F.split(a_nm, "#"), 1)).otherwise(a_nm)
        a_ord = F.when(a_has, _f(F.split(a_nm, "#"), 2)).otherwise(F.lit(""))
        c12 = F.concat(c1_id, c2_eff)
        article = F.when(
            F.length(_e(f2)) > 5,
            _ilt(a_id, c12 if dollar else F.lit(""), F.lit(""), "article",
                 a_name, a_ord),
        ).otherwise(
            _ilt(F.lit(ZERO) if dollar else F.lit(""),
                 c12 if dollar else F.lit(""), F.lit(""), "article",
                 F.lit(""), F.lit(""))
        )
        s_idraw, s_nm = idname(f3)
        if dollar:
            s_has_dash = F.instr(_e(s_idraw), "-") > 0
            s_id = F.when(
                s_has_dash, _f(F.split(s_idraw, "-"), 1)
            ).otherwise(s_idraw)
            s_psub = F.when(
                s_has_dash, _f(F.split(s_idraw, "-"), 2)
            ).otherwise(F.lit(""))
            s_name, s_ord = s_nm, F.lower(_e(s_nm))
        else:
            s_id, s_psub = s_idraw, F.lit("")
            s_has = F.instr(_e(f3), "#") > 0
            s_name = F.when(s_has, _f(F.split(s_nm, "#"), 1)).otherwise(s_nm)
            s_ord = F.when(
                s_has, _f(F.split(s_nm, "#"), 2)
            ).otherwise(F.lit(""))
        subject = F.when(
            F.length(_e(f3)) > 5,
            _ilt(s_id, c12, s_psub, "subject", s_name, s_ord),
        ).otherwise(
            _ilt(F.lit(ZERO) if dollar else F.lit(""),
                 c12 if dollar else F.lit(""), F.lit(""), "subject",
                 F.lit(""), F.lit(""))
        )
        s_eff = F.when(F.length(_e(f3)) > 5, s_id).otherwise(
            F.lit(ZERO) if dollar else F.lit("")
        )
        ss_id, ss_nm = idname(f4)
        ss_has = F.instr(_e(f4), "#") > 0
        ss_name = F.when(ss_has, _f(F.split(ss_nm, "#"), 1)).otherwise(ss_nm)
        ss_ord = F.when(
            ss_has, _f(F.split(ss_nm, "#"), 2)
        ).otherwise(F.lit(""))
        subsubject = F.when(
            F.length(_e(f4)) > 5,
            _ilt(ss_id, s_eff, F.lit(""), "subsubject", ss_name, ss_ord),
        ).otherwise(
            _ilt(F.lit(ZERO) if dollar else F.lit(""), s_eff, F.lit(""),
                 "subsubject", F.lit(""), F.lit(""))
        )
        return F.struct(
            country1.alias("country1"), country2.alias("country2"),
            article.alias("article"), subject.alias("subject"),
            subsubject.alias("subsubject"),
        )

    empty = F.array().cast(
        "array<struct<country1:%(i)s,country2:%(i)s,article:%(i)s,"
        "subject:%(i)s,subsubject:%(i)s>>" % {"i": _ILT_DDL}
    )
    dollar_trees = F.transform(F.split(c, r"\$"), lambda e: build(e, True))
    single_tree = F.array(build(F.coalesce(c, F.lit("")), False))
    # null/'' → no trees ('' is falsy in the reference's !!-guards);
    # '$'-list → per element; else one tree
    trees = (
        F.when(c.isNull() | (c == ""), empty)
        .when(F.instr(c, "$") > 0, dollar_trees)
        .otherwise(single_tree)
    )
    names = F.transform(
        trees,
        lambda t: F.concat(
            t["country1"]["id"], t["country2"]["id"], t["article"]["id"],
            t["subject"]["id"], t["subsubject"]["id"],
        ),
    )
    return F.struct(trees.alias("trees"), names.alias("names"))


def parse_iltinfo_treaty(
    col: Column | str, flaginfo: Column | str, year_id: Column
) -> Column:
    """Treaty iltassociation variant (ts:6188-6407) → struct{trees,
    names, countries, articles, subjects}.

    Differences from the other variants: skipped sub-fields stay fully
    EMPTY structs (no type, no zero-id fill); country2 additionally
    requires id != the 18-zero sentinel; flag1/flag2 come from the row's
    ``flaginfo`` ('|' pair, uppercased names, quotes stripped);
    searchiltcitation names substitute the 18-zero id for missing parts
    and append the year id; countries/articles/subjects collect lowercase
    names across entries for the weight-8/1/16 Suggest pools.
    Deviation (documented): the reference's article/subject pid concats
    ``objCountry2.id`` even when country2 was skipped, producing the JS
    string 'undefined' (ts:6236,6247) — we use '' there."""
    c = _c(col)
    fi = _c(flaginfo)
    ZERO = "000000000000000000"

    def empty_struct() -> Column:
        return F.struct(
            *[F.lit("").alias(f) for f in
              ("id", "pid", "pSubId", "type", "name", "shortName",
               "ordering")],
            F.lit(0).alias("orderInteger"),
            F.lit("").alias("url"),
        )

    flags = F.split(fi, r"\|")
    flags_ok = fi.isNotNull() & (F.size(flags) == 2)

    def flag_of(i: int) -> Column:
        raw = F.trim(F.coalesce(_f(flags, i), F.lit("")))
        noq = F.regexp_replace(raw, "'", "")
        return F.when(
            flags_ok,
            F.struct(
                raw.alias("id"), F.lit("").alias("pid"),
                F.lit("").alias("pSubId"), F.lit("").alias("type"),
                F.upper(noq).alias("name"), F.lit("").alias("shortName"),
                F.lower(noq).alias("ordering"),
                F.lit(0).alias("orderInteger"),
                F.lower(noq).alias("url"),
            ),
        ).otherwise(empty_struct())

    def build(e: Column) -> Column:
        p = F.split(e, r"\|")
        f0, f1, f2, f3, f4 = (_f(p, i) for i in range(1, 6))

        def idname(f: Column):
            cr = F.split(f, r"\^")
            return _e(_f(cr, 1)), _e(_f(cr, 2))

        c1_id, c1_name = idname(f0)
        country1 = _ilt(
            c1_id, F.lit(""), F.lit(""), "country1", c1_name,
            F.lower(c1_name),
        )
        c2_id, c2_name = idname(f1)
        c2_ok = (F.length(_e(f1)) > 5) & (c2_id != ZERO)
        country2 = F.when(
            c2_ok,
            _ilt(c2_id, c1_id, F.lit(""), "country2", c2_name,
                 F.lower(c2_name)),
        ).otherwise(empty_struct())
        a_id, a_nm = idname(f2)
        a_name = F.coalesce(_f(F.split(a_nm, "#"), 1), F.lit(""))
        a_ord = F.coalesce(_f(F.split(a_nm, "#"), 2), F.lit(""))
        c12 = F.concat(c1_id, F.when(c2_ok, c2_id).otherwise(F.lit("")))
        a_ok = F.length(_e(f2)) > 5
        article = F.when(
            a_ok,
            _ilt(a_id, F.when(c1_id != "", c12).otherwise(F.lit("")),
                 F.lit(""), "article", a_name, a_ord),
        ).otherwise(empty_struct())
        s_id, s_name = idname(f3)
        s_ok = F.length(_e(f3)) > 5
        subject = F.when(
            s_ok,
            _ilt(s_id, F.when(c1_id != "", c12).otherwise(F.lit("")),
                 F.lit(""), "subject", s_name, F.lower(s_name)),
        ).otherwise(empty_struct())
        ss_id, ss_name = idname(f4)
        ss_ok = F.length(_e(f4)) > 5
        subsubject = F.when(
            ss_ok,
            _ilt(ss_id, F.when(s_ok, s_id).otherwise(F.lit("")),
                 F.lit(""), "subsubject", ss_name, F.lower(ss_name)),
        ).otherwise(empty_struct())
        return F.struct(
            country1.alias("country1"), country2.alias("country2"),
            article.alias("article"), subject.alias("subject"),
            subsubject.alias("subsubject"),
            flag_of(1).alias("flag1"), flag_of(2).alias("flag2"),
        )

    # null column takes the '$' branch (JS undefined?.indexOf ≠ -1) with
    # no entries; '' takes the non-'$' branch but !! guards then skip →
    # also no entries
    dollar_trees = F.transform(F.split(c, r"\$"), build)
    single_tree = F.array(build(F.coalesce(c, F.lit(""))))
    empty = F.slice(single_tree, 1, 0)
    trees = (
        F.when(c.isNull() | (c == ""), empty)
        .when(F.instr(c, "$") > 0, dollar_trees)
        .otherwise(single_tree)
    )

    def zid(t: Column, part: str) -> Column:
        v = t[part]["id"]
        return F.when(v == "", F.lit(ZERO)).otherwise(v)

    names = F.transform(
        trees,
        lambda t: F.concat(
            t["country1"]["id"], zid(t, "country2"), zid(t, "article"),
            zid(t, "subject"), zid(t, "subsubject"), year_id,
        ),
    )

    def pool(parts: list[str]) -> Column:
        # interleaved per entry (c1, c2, c1, c2, …) as the row loop pushes
        merged = F.flatten(
            F.transform(
                trees,
                lambda t: F.array(
                    *[F.lower(F.trim(t[p]["name"])) for p in parts]
                ),
            )
        )
        return F.filter(merged, lambda n: n.isNotNull() & (n != ""))

    return F.struct(
        trees.alias("trees"), names.alias("names"),
        pool(["country1", "country2"]).alias("countries"),
        pool(["article"]).alias("articles"),
        pool(["subject", "subsubject"]).alias("subjects"),
    )


def search_ilt_citation(ilt: Column) -> Column:
    """searchiltcitation names: country1.id + country2.id + article.id +
    subject.id + subsubject.id per tree with non-empty country1
    (ts:2444,2562)."""
    return F.transform(
        F.filter(ilt, lambda t: t["country1"]["id"] != ""),
        lambda t: F.concat(
            t["country1"]["id"], t["country2"]["id"], t["article"]["id"],
            t["subject"]["id"], t["subsubject"]["id"],
        ),
    )


def ilt_suggest_inputs(ilt: Column) -> Column:
    """The countries / articles / subjects Suggest inputs the ilt region
    accumulates (weights 8 / 1 / 16, ts:2559-2576): struct of three
    lowercase name arrays (empty names dropped)."""

    def names(path1: str, path2: str | None = None) -> Column:
        a = F.transform(
            ilt, lambda t: F.lower(F.trim(t[path1]["name"]))
        )
        if path2:
            a = F.concat(
                a, F.transform(ilt, lambda t: F.lower(F.trim(t[path2]["name"])))
            )
        return F.filter(a, lambda n: n.isNotNull() & (n != ""))

    return F.struct(
        names("country1", "country2").alias("countries"),
        names("article").alias("articles"),
        names("subject", "subsubject").alias("subjects"),
    )


# --- AuthorName @-grammar (ts:5234-5262) -----------------------------------


def parse_authors(col: Column | str) -> Column:
    """AuthorName = '$'-list of ``id@name~designation^social#image!order``
    → array of author structs (GenericInfo + designation/socialSiteUrl/
    imagePath/orderInteger)."""
    elems = F.filter(F.split(_c(col), r"\$"), lambda e: e != "")

    def build(e: Column) -> Column:
        td = F.split(e, "~")
        head, tail = _f(td, 1), _f(td, 2)
        aid = F.trim(_e(_f(F.split(head, "@"), 1)))
        name = _e(_f(F.split(head, "@"), 2))
        desig = F.trim(_e(_f(F.split(tail, r"\^"), 1)))
        social_block = _f(F.split(tail, r"\^"), 2)
        social = F.trim(_e(_f(F.split(social_block, "#"), 1)))
        img_block = F.trim(_e(_f(F.split(social_block, "#"), 2)))
        img = _e(_f(F.split(img_block, "!"), 1))
        order_int = F.coalesce(
            _f(F.split(img_block, "!"), 2).try_cast("int"), F.lit(0)
        )
        return F.struct(
            aid.alias("id"),
            F.lit("author").alias("type"),
            F.lit("").alias("shortName"),
            name.alias("name"),
            desig.alias("designation"),
            social.alias("socialSiteUrl"),
            img.alias("imagePath"),
            order_int.alias("orderInteger"),
        )

    return F.transform(elems, build)
