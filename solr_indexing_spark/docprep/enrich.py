"""Enrichment joins + suggest/boost assembly (J1, F15, searchboosttext).

The reference's map-side dictionary lookups (``CasePopularActsfinal()``
rebuilt per call — an inefficiency Catalyst's broadcast join fixes,
SURVEY.md §4.1) become broadcast left-outer joins with an "Other Acts"
default row (solrIndexCreation.ts:1137-1164; defaults common.ts:259-263).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .scalars import remove_special_with_space, slugify, string_only

OTHER_ACT_ID = "999999999999999999"
OTHER_ACT_NAME = "Other Acts"
OTHER_ACT_ORDERING = "999999999"


def popular_acts_join(
    df: DataFrame,
    popular_acts: DataFrame,
    act_id_col: str = "act_id",
) -> DataFrame:
    """J1: broadcast left-outer against the popular-acts dim; misses get the
    synthetic 'Other Acts' row (id 999…9, common.ts:259-263,480-486).

    ``popular_acts``: dim DataFrame (act_id, act_name, cat_urls array) — tiny,
    always broadcast. At 10^12-doc scale this stays a map-side join; no
    shuffle on the fact side.
    """
    dim = F.broadcast(
        popular_acts.select(
            F.col("act_id").alias("_pa_id"),
            F.col("act_name").alias("_pa_name"),
            F.col("cat_urls").alias("_pa_cats"),
        )
    )
    joined = df.join(dim, df[act_id_col] == F.col("_pa_id"), "left")
    return (
        joined.withColumn("is_popular_act", F.col("_pa_id").isNotNull())
        .withColumn(
            "resolved_act_id",
            F.when(F.col("_pa_id").isNotNull(), F.col(act_id_col)).otherwise(
                F.lit(OTHER_ACT_ID)
            ),
        )
        .withColumn(
            "resolved_act_name",
            F.coalesce(F.col("_pa_name"), F.lit(OTHER_ACT_NAME)),
        )
        .withColumn(
            "resolved_act_url",
            slugify(F.lower(F.coalesce(F.col("_pa_name"), F.lit(OTHER_ACT_NAME)))),
        )
        .drop("_pa_id", "_pa_name")
        .withColumnRenamed("_pa_cats", "act_cat_urls")
    )


# --- F15: weighted completion entries (Suggest) ---------------------------
# weight table per SURVEY.md §2.8-F15 (sites solrIndexCreation.ts:321-2091)
SUGGEST_WEIGHTS = {
    "act": 20, "subgroup": 20, "subject": 18, "heading_subject": 16,
    "court": 12, "bench": 10, "country": 8, "section": 1, "article": 1,
    "heading": 1, "citation": 1, "benchtype": 1,
}


def suggest_entry(inputs: Column, kind: str) -> Column:
    """One CompletionField {Input: array<string>, Weight: int}
    (indexDocument.ts:106-109). Null when the input list is empty —
    the reference only pushes non-empty groups."""
    w = SUGGEST_WEIGHTS[kind]
    return F.when(
        F.size(inputs) > 0,
        F.struct(inputs.alias("Input"), F.lit(w).alias("Weight")),
    )


def suggest_array(*entries: Column) -> Column:
    """Assemble Suggest[] dropping absent groups."""
    return F.filter(F.array(*entries), lambda s: s.isNotNull())


def searchboosttext(*cols: Column | str, literals: dict[int, str] | None = None) -> Column:
    """F13: lowercase + 18-digit-id strip + special-char→space concat of the
    per-doctype metadata recipe (ts:2753-2771). ``literals`` injects fixed
    words before the i-th column ('appeal no', 'circular no ' — ts:2762,4573)."""
    pieces: list[Column] = []
    for i, c in enumerate(cols):
        if literals and i in literals:
            pieces.append(F.lit(literals[i]))
        col = c if isinstance(c, Column) else F.col(c)
        pieces.append(F.lower(string_only(col.cast("string"))))
    return remove_special_with_space(F.concat_ws(" ", *pieces))
