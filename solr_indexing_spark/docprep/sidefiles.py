"""S5 — side-file content reads, Spark-first.

The reference indexers read document content from filesystem paths while
looping rows:

- AAAIndex (solrIndexCreation.ts:7689-7698): when ``CompareFileInfo`` is
  set, ``File.ReadAllText(FilePath + path)`` becomes
  ``comparefilecontent``, and ``comparefileheading`` is ONLY assigned when
  the file exists — a missing file leaves both unset even though the
  heading is parseable from the packed column.
- AAAModelReportIndex (solrIndexCreation.ts:9176-9183): when ``url`` is
  set and ``FilePath + url`` exists, its text REPLACES the composed
  ``fullcontent``; otherwise the composed value stands.

A per-row driver-side file read cannot scale (10^12 rows × one
``File.Exists`` + read each), and it would also break the composed
pipelines' linear analyzed-plan chains (plancache.py). So the read is
re-expressed as a table: ``load_side_files`` scans a directory once with
Spark's ``binaryFile`` source into ``(relpath, content)``, and the
``attach_*`` functions LEFT-JOIN that table onto the composed document
output. The side-file corpus is a dimension (bounded by the number of
attachment files, not documents), so the join side is broadcast — at
1000 executors this is one scan plus a map-side hash join, no shuffle of
the document stream. If the attachment corpus ever outgrew broadcast,
dropping the hint falls back to a shuffle join with no semantic change.

Existence semantics survive the translation exactly: an unmatched join
row is the reference's ``!File.Exists`` branch (AAA nulls both
comparefile fields; model report keeps the composed fullcontent).

Encoding: the reference reads with ``System.Text.Encoding.Default`` —
the Windows ANSI code page, i.e. windows-1252 on the reference
deployment — so bytes are decoded as windows-1252, not UTF-8.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: .NET Encoding.Default on the reference's deployment platform.
REFERENCE_ENCODING = "windows-1252"

# Spark's `decode` supports a fixed charset list without windows-1252, so
# cp1252 is expressed as iso-8859-1 (byte-transparent: every byte maps to
# the code point of its value) + a translate() of the 27 defined bytes in
# 0x80-0x9F where the two encodings differ (the 5 undefined cp1252 bytes
# keep their latin-1 C1 identity — .NET's best-fit decoder does the same).
_CP1252_FROM = ""
_CP1252_TO = ""
for _b in range(0x80, 0xA0):
    try:
        _CP1252_TO += bytes([_b]).decode("cp1252")
    except UnicodeDecodeError:
        continue
    _CP1252_FROM += chr(_b)


def decode_cp1252(col: Column) -> Column:
    """Decode a binary column as windows-1252, JVM-side."""
    return F.translate(F.decode(col, "iso-8859-1"), _CP1252_FROM, _CP1252_TO)


def _replace_first(col: Column, find: str, repl: str) -> Column:
    """JS ``String.replace(str, str)`` — FIRST occurrence only (the
    reference applies ``.replace(" / ", "\\\\")`` with string args, so a
    path containing the token twice keeps its second occurrence)."""
    pos = F.instr(col, find)
    return F.when(
        pos > 0,
        F.concat(
            F.substring(col, F.lit(1), pos - 1),
            F.lit(repl),
            F.substring(col, pos + len(find), F.length(col)),
        ),
    ).otherwise(col)


def load_side_files(
    spark, root: str, pattern: str = "*", encoding: str = REFERENCE_ENCODING
) -> DataFrame:
    """Scan ``root`` with the binaryFile source into (relpath, content).

    ``relpath`` is the file name relative to ``root`` (the reference's
    ``AppSettings["FilePath"]`` prefix is the load root here, so join
    keys carry only the packed column's relative part). Decoding uses
    windows-1252 to mirror ``File.ReadAllText(..., Encoding.Default)``.
    """
    df = spark.read.format("binaryFile").option(
        "pathGlobFilter", pattern
    ).load(root)
    # Derive relpath by POSITION, not regex: probe one loaded path for the
    # scheme/prefix form Spark actually produced (file:/…, hdfs://…, …).
    # A regex anchored on "^file:/*" breaks on roots containing regex
    # metacharacters and on non-local URIs — every join then misses and the
    # code silently takes the file-missing branch.
    probe = df.select("path").limit(1).collect()
    if probe:
        marker = root.rstrip("/") + "/"
        cut = probe[0]["path"].find(marker)
        if cut < 0:
            raise ValueError(
                f"side-file path {probe[0]['path']!r} does not contain the "
                f"load root {marker!r} — cannot derive relative join keys"
            )
        strip_len = cut + len(marker)
    else:
        strip_len = 0  # empty corpus: relpath never consulted
    return df.select(
        F.col("path").substr(
            F.lit(strip_len + 1), F.length("path")
        ).alias("relpath"),
        (
            decode_cp1252(F.col("content"))
            if encoding == REFERENCE_ENCODING
            else F.decode(F.col("content"), encoding)
        ).alias("content"),
    )


def compare_file_relpath(compare_file_info: Column | str) -> Column:
    """The AAA attachment's relative path from packed ``CompareFileInfo``.

    Reference (ts:7691-7692): ``split('|')[1].split('^')[0]`` with
    ``" / "`` → ``"\\"`` (a Windows path join quirk, applied verbatim).
    Null when the packed column is null/empty.
    """
    c = (
        F.col(compare_file_info)
        if isinstance(compare_file_info, str)
        else compare_file_info
    )
    s = c.cast("string")
    raw = F.try_element_at(
        F.split(F.try_element_at(F.split(s, r"\|"), F.lit(2)), r"\^"),
        F.lit(1),
    )
    return F.when(
        c.isNotNull() & (s != ""),
        F.trim(_replace_first(raw, " / ", "\\")),
    )


def attach_compare_file_content(
    doc: DataFrame, side_files: DataFrame
) -> DataFrame:
    """AAA: fill ``comparefilecontent`` from the side-file table and
    enforce the reference's existence gate on ``comparefileheading``
    (ts:7693-7696 assigns both only inside ``if (File.Exists)``).

    ``doc`` is ``aaa_document(...)`` output (carries ``comparefilepath``).
    """
    side = F.broadcast(
        side_files.select(
            F.col("relpath").alias("_sf_relpath"),
            F.col("content").alias("_sf_content"),
        )
    )
    joined = doc.join(
        side, doc["comparefilepath"] == side["_sf_relpath"], "left"
    )
    matched = F.col("_sf_relpath").isNotNull()
    return joined.withColumns(
        {
            "comparefilecontent": F.when(matched, F.col("_sf_content")),
            "comparefileheading": F.when(
                matched, F.col("comparefileheading")
            ),
        }
    ).drop("_sf_relpath", "_sf_content")


def attach_model_report_content(
    doc: DataFrame, side_files: DataFrame
) -> DataFrame:
    """Model report: override ``fullcontent`` with the side file's text
    when ``filenamepath`` resolves to an existing file (ts:9176-9183);
    the composed value stands otherwise.

    The reference applies the same ``" / "`` → ``"\\"`` quirk to the url
    before probing the filesystem.
    """
    side = F.broadcast(
        side_files.select(
            F.col("relpath").alias("_sf_relpath"),
            F.col("content").alias("_sf_content"),
        )
    )
    key = _replace_first(F.col("filenamepath").cast("string"), " / ", "\\")
    joined = doc.join(side, key == F.col("_sf_relpath"), "left")
    return joined.withColumn(
        "fullcontent",
        F.when(
            F.col("_sf_relpath").isNotNull(), F.col("_sf_content")
        ).otherwise(F.col("fullcontent")),
    ).drop("_sf_relpath", "_sf_content")
