"""Time the end-to-end ingest job (packed rows → index + completions).

Measures the html-only build path: the composed pipeline's fullcontent
is extracted inside build_index, so this is the path where the
single-extraction restructure (build.py _quarantine_pages persist)
shows up — the quarantine action and the docID range shuffle previously
each re-ran the composer + extraction.

Usage: python tools/bench_ingest.py [n_rows] [--dual]
Prints one JSON line {n, wall_s, docs_per_sec}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def packed_case_laws(spark, n: int):
    """Synthetic packed case_laws rows with a realistically sized body
    (~2 KB of paragraph text) so extraction cost is visible."""
    from solr_indexing_spark.docprep.pipelines import (
        CASE_LAWS_INPUT_COLUMNS,
        ensure_columns,
    )

    body = " ".join(
        f"clause {i} of the synthetic judgment text corpus" for i in range(40)
    )
    df = spark.range(n).select(
        F.concat(F.lit("M"), F.col("id").cast("string")).alias("id"),
        F.concat(F.lit("S"), F.col("id").cast("string")).alias("mid"),
        F.lit("Case Laws").alias("documenttype"),
        F.concat(
            F.lit("<document><p>Unique token zq"),
            F.col("id").cast("string"),
            F.lit(f" appears here</p><p>{body}</p>"),
            F.lit(f"<p>{body}</p><p>{body}</p></document>"),
        ).alias("fullcontent"),
        F.lit("20200101^01-01-2020").alias("documentdate"),
        F.concat(F.lit("Case "), F.col("id").cast("string")).alias("Heading"),
        F.concat(
            F.lit("Topic "), F.col("id").cast("string"),
            F.lit("|Case "), F.col("id").cast("string"),
        ).alias("HeadingSubheading"),
        F.lit("Supreme Court").alias("court"),
    )
    return ensure_columns(df, CASE_LAWS_INPUT_COLUMNS)


def main() -> None:
    args = sys.argv[1:]
    sizes = [a for a in args if not a.startswith("--")]
    n = int(sizes[0]) if sizes else 20000
    dual = "--dual" in args

    from solr_indexing_spark.ingest import run_ingest
    from solr_indexing_spark.session import get_spark

    spark = get_spark("bench-ingest", shuffle_partitions=32)
    work = tempfile.mkdtemp(prefix="bench_ingest_")
    packed_path = f"{work}/packed.parquet"
    packed_case_laws(spark, n).write.mode("overwrite").parquet(packed_path)
    packed = spark.read.parquet(packed_path)
    packed.count()  # warm the session + file index before timing

    t0 = time.monotonic()
    job = run_ingest(spark, packed, "case_laws", f"{work}/job", dual=dual)
    wall = time.monotonic() - t0
    print(
        json.dumps(
            {
                "n": n,
                "dual": dual,
                "wall_s": round(wall, 2),
                "docs_per_sec": round(n / wall, 1),
                "n_docs": job["n_docs"],
                "completion_entries": job["completion_entries"],
            }
        )
    )
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
