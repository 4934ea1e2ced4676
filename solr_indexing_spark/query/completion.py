"""Weighted prefix completion (the reference's Suggest field, served).

The reference builds weighted completion entries per document
(``Suggest[]: {Input: string[], Weight}``, indexDocument.ts:106-109; weights
per kind at solrIndexCreation.ts:321-2091 — re-expressed in
docprep/enrich.py) and lets Solr's suggester serve them. Here the serving
side is a DataFrame operator over a completion table:

    completion(input: string, weight: int [, payload…])

Layout for scale: the table is written range-sorted by ``input`` so a
prefix filter prunes parquet row groups via min/max stats — a prefix query
reads only the files whose [min,max] range can contain the prefix.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# v2 = inputs stored lowercased (the raw-column pushdown contract);
# v1 tables (no manifest) stored mixed case and silently miss under the
# raw-column filter — gate loudly instead (mirrors segments'
# read_manifest format_version check)
COMPLETION_FORMAT_VERSION = 2
_MANIFEST = "_completion_manifest.json"


def flatten_suggests(df: DataFrame, suggest_col: str = "Suggest") -> DataFrame:
    """docs with a Suggest[] column → (input, weight) rows (one per Input
    string of each CompletionField). Inputs are lowercase-normalized here —
    the completion-table contract (see ``complete``) is that stored inputs
    are lowercase so the prefix filter stays pushdown-eligible."""
    return (
        df.select(F.explode(suggest_col).alias("s"))
        .select(F.explode("s.Input").alias("raw"), F.col("s.Weight").alias("weight"))
        .select(
            F.lower(F.col("raw")).alias("input"),
            "weight",
            F.col("raw").alias("display"),
        )
        .filter(F.col("input").isNotNull() & (F.trim(F.col("input")) != ""))
    )


def build_completion_index(
    completion: DataFrame, out_dir: str, num_files: int | None = None
) -> None:
    """Write the completion table range-sorted by input (row-group pruning
    for prefix scans). Duplicate inputs keep their max weight.

    ``input`` is lowercased HERE, at build time, so the query-side prefix
    filter is over the raw stored column — ``StartsWith`` on a bare column
    is pushed to Parquet (min/max row-group pruning + PushedFilters), while
    ``lower(input).startswith(p)`` would not be.

    The original casing is preserved in a companion ``display`` column
    (Solr suggesters match case-insensitively but return the raw input;
    all-lowercase results were a user-visible casing loss). Per lowercased
    key the heaviest entry's original spelling wins (ties: greatest
    spelling) — deterministic across partitionings. The prefix filter never
    touches ``display``, so the Parquet pushdown is unaffected."""
    src = completion
    if "display" not in src.columns:
        src = src.withColumn("display", F.col("input"))
    deduped = (
        src.withColumn("input", F.lower(F.col("input")))
        .groupBy("input")
        .agg(
            F.max("weight").alias("weight"),
            F.max(F.struct("weight", "display"))
            .getField("display")
            .alias("display"),
        )
    )
    n = num_files or completion.sparkSession.sparkContext.defaultParallelism
    deduped.repartitionByRange(n, "input").sortWithinPartitions("input").write.mode(
        "overwrite"
    ).parquet(out_dir)
    with open(os.path.join(out_dir, _MANIFEST), "w") as f:
        json.dump(
            {"format_version": COMPLETION_FORMAT_VERSION, "lowercased": True},
            f,
        )


def complete(
    source: DataFrame, prefix: str, k: int = 10
) -> DataFrame:
    """Top-k completions for a prefix: (input, weight) by
    (weight desc, input asc) — deterministic. ``source`` is the completion
    table (read from ``build_completion_index`` output or built inline).

    The ``startswith`` filter is over the RAW column (inputs are stored
    lowercased by ``build_completion_index``), so it reaches the Parquet
    scan as ``PushedFilters: [StringStartsWith(input,…)]`` and prunes row
    groups via min/max stats on the sorted layout; the aggregation is
    partial+final over only the matching rows. A ``lower(input)`` wrapper
    here would defeat the pushdown — don't reintroduce it.

    If the source carries a ``display`` column (tables written by
    ``build_completion_index``) the original-cased spelling is returned
    alongside; bare (input, weight) sources keep the two-column shape.
    """
    p = prefix.lower()
    matched = source.filter(F.col("input").startswith(p))
    if "display" in source.columns:
        return (
            matched.groupBy("input")
            .agg(
                F.max("weight").alias("weight"),
                F.max(F.struct("weight", "display"))
                .getField("display")
                .alias("display"),
            )
            .orderBy(F.desc("weight"), F.asc("input"))
            .limit(k)
        )
    return (
        matched.groupBy("input")
        .agg(F.max("weight").alias("weight"))
        .orderBy(F.desc("weight"), F.asc("input"))
        .limit(k)
    )


def complete_dir(
    spark: SparkSession, index_dir: str, prefix: str, k: int = 10
) -> DataFrame:
    _check_format(index_dir)
    return complete(spark.read.parquet(index_dir), prefix, k)


def _check_format(index_dir: str) -> None:
    """Reject pre-v2 completion tables (mixed-case inputs on disk): under
    the raw-column prefix filter they would silently return nothing."""
    path = os.path.join(index_dir, _MANIFEST)
    if not os.path.exists(path):
        raise ValueError(
            f"completion table at {index_dir} has no {_MANIFEST} — written "
            "by a pre-v2 build (inputs not lowercase-normalized); rebuild "
            "with build_completion_index"
        )
    with open(path) as f:
        meta = json.load(f)
    if meta.get("format_version") != COMPLETION_FORMAT_VERSION:
        raise ValueError(
            f"completion table format_version {meta.get('format_version')} "
            f"!= {COMPLETION_FORMAT_VERSION}; rebuild with "
            "build_completion_index"
        )
