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
