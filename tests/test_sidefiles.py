"""S5 side-file content reads (docprep/sidefiles.py) — the reference's
per-row ``File.ReadAllText`` re-expressed as a broadcast join against a
binaryFile scan (solrIndexCreation.ts:7689-7698, 9176-9183).

Pinned here: the packed-path parse (single-occurrence ``" / "`` → ``"\\"``
— JS string replace), the existence gate (a missing file nulls BOTH AAA
comparefile fields; model report keeps the composed fullcontent), the
windows-1252 decode (Encoding.Default), and the join strategy (broadcast
hash join — the document stream must not shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from solr_indexing_spark.docprep import sidefiles


def _parse(spark, value):
    df = spark.createDataFrame([(value,)], "cfi string")
    return df.select(
        sidefiles.compare_file_relpath("cfi").alias("p")
    ).head()["p"]


def test_compare_file_relpath_parse(spark):
    assert _parse(spark, "C|a.txt^Head") == "a.txt"
    assert _parse(spark, None) is None
    assert _parse(spark, "") is None
    # no second pipe element -> null, like the reference's [1] indexing
    assert _parse(spark, "only") is None


def test_replace_first_occurrence_only(spark):
    """JS ``replace(" / ", "\\\\")`` with string args touches only the
    FIRST occurrence — later ones survive verbatim."""
    assert _parse(spark, "C|a / b.txt^H") == "a\\b.txt"
    assert _parse(spark, "C|a / b / c.txt^H") == "a\\b / c.txt"
    assert _parse(spark, "C|plain.txt^H") == "plain.txt"


def _side(spark, rows):
    return spark.createDataFrame(rows, "relpath string, content string")


def test_attach_compare_file_existence_gate(spark):
    """ts:7693-7696 assigns content AND heading only inside
    ``if (File.Exists)`` — an unmatched path must null the heading even
    though it parsed fine from the packed column."""
    doc = spark.createDataFrame(
        [
            ("d1", "hit.txt", "H1"),
            ("d2", "miss.txt", "H2"),
            ("d3", None, None),
        ],
        "id string, comparefilepath string, comparefileheading string",
    )
    out = sidefiles.attach_compare_file_content(
        doc, _side(spark, [("hit.txt", "BODY")])
    )
    rows = {r.id: r for r in out.collect()}
    assert rows["d1"].comparefilecontent == "BODY"
    assert rows["d1"].comparefileheading == "H1"
    assert rows["d2"].comparefilecontent is None
    assert rows["d2"].comparefileheading is None
    assert rows["d3"].comparefilecontent is None


def test_attach_model_report_override(spark):
    """ts:9176-9183: side text REPLACES fullcontent when the url's file
    exists; the composed value stands otherwise. The " / " quirk applies
    to the url before the probe."""
    doc = spark.createDataFrame(
        [
            ("d1", "mr.txt", "composed1"),
            ("d2", "absent.txt", "composed2"),
            ("d3", "a / b.txt", "composed3"),
        ],
        "id string, filenamepath string, fullcontent string",
    )
    out = sidefiles.attach_model_report_content(
        doc, _side(spark, [("mr.txt", "FILE1"), ("a\\b.txt", "FILE3")])
    )
    rows = {r.id: r for r in out.collect()}
    assert rows["d1"].fullcontent == "FILE1"
    assert rows["d2"].fullcontent == "composed2"
    assert rows["d3"].fullcontent == "FILE3"


def test_load_side_files_cp1252(spark, tmp_path):
    """Encoding.Default is windows-1252: bytes 0x80-0x9F decode to the
    cp1252 symbols (euro, curly quotes, dashes), not C1 controls."""
    raw = b"caf\xe9 \x93quoted\x94 \x96 \x80100"
    (tmp_path / "enc.txt").write_bytes(raw)
    (tmp_path / "plain.txt").write_bytes(b"ascii only")
    out = {
        r.relpath: r.content
        for r in sidefiles.load_side_files(spark, str(tmp_path)).collect()
    }
    assert out["enc.txt"] == raw.decode("cp1252")
    assert out["enc.txt"] == "café “quoted” – €100"
    assert out["plain.txt"] == "ascii only"


def test_attach_is_broadcast_no_doc_shuffle(spark, tmp_path):
    """The side corpus is the dimension: the physical plan must broadcast
    it and leave the document stream exchange-free (at 1000 executors a
    shuffle here would repartition the full 100 TB scan)."""
    (tmp_path / "x.txt").write_bytes(b"x")
    doc = spark.range(100).select(
        F.col("id").cast("string").alias("id"),
        # data-dependent key: a literal would constant-fold the equi-join
        # away (into a scan filter + nested-loop), hiding the real shape
        F.concat(
            F.lit("f"), (F.col("id") % 3).cast("string"), F.lit(".txt")
        ).alias("comparefilepath"),
        F.lit("H").alias("comparefileheading"),
    )
    out = sidefiles.attach_compare_file_content(
        doc, sidefiles.load_side_files(spark, str(tmp_path))
    )
    out.collect()  # finalize the AQE plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
