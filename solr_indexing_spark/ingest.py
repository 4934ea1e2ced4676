"""End-to-end ingest job: packed per-doctype rows → composed
``IndexDocument``s → BM25 index segment(s) + completion table, one run.

This is the reference's actual job shape (solrIndexCreation.ts: each
``*Index`` method = ETL loop + BulkIndexing + suggester push in one
pass): a doctype's packed table goes through its composed pipeline
(docprep/pipelines.py), the finalized ``fullcontent`` (searchboosttext
already injected as the hidden metadata div — F12/F13) is indexed into
segment(s) under ``out_dir``, and the per-document ``Suggest[]`` entries
become the completion table. With ``dual=True`` both analyzer variants
are built from one tokenized stream (build_index_dual — the reference
posts every batch to IndexName AND IndexNameStopword, ts:877-880).

Dataflow (all lazy until the builds; no driver materialization of rows):

    packed ──composer (plan-cached linear map)──▶ docs
      ├─ select(id→url, fullcontent→html) ──▶ build_index[_dual]
      │      (extraction + quarantine + docID + postings inside)
      └─ explode(Suggest[].Input) ──▶ build_completion_index

The composed DataFrame is NOT persisted: the two consumers each re-run
the composer map over the packed scan. The completion leg prunes to the
``Suggest`` column only (narrow scan), so the duplicated work is one
cheap column-pruned pass — persisting the full composed output (with
fullcontent) would cost more than it saves at corpus scale.

CLI:  python -m solr_indexing_spark.ingest --doctype case_laws \\
          --input packed.parquet --out /path/idx [--dual] [--positions]
"""

from __future__ import annotations

import argparse
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .docprep import pipelines as P
from .docprep import sidefiles
from .indexing.build import build_index, build_index_dual
from .query.completion import build_completion_index

#: doctype key → composed pipeline (reference *Index method). CaseFinder
#: fans out one row per digest paragraph (explode), like its loop.
PIPELINES = {
    "case_laws": P.case_laws_document,
    "case_laws_partial": P.case_laws_partial_document,
    "case_finder": P.case_finder_documents,
    "act_rule": P.act_rule_document,
    "cirnot": P.cirnot_document,
    "article": P.article_document,
    "form": P.form_document,
    "treaty": P.treaty_document,
    "news": P.news_document,
    "commentary": P.commentary_document,
    "commentary_book": P.commentary_book_document,
    "aaa": P.aaa_document,
    "aaa_model_report": P.aaa_model_report_document,
}


def compose(
    packed: DataFrame,
    doctype: str,
    templateid: str = "",
    side_files_root: str | None = None,
) -> DataFrame:
    """Packed rows → composed IndexDocument DataFrame, including the S5
    side-file attach for the doctypes that read attachment files."""
    if doctype not in PIPELINES:
        raise ValueError(
            f"unknown doctype {doctype!r}; one of {sorted(PIPELINES)}"
        )
    doc = PIPELINES[doctype](packed, templateid=templateid)
    if side_files_root:
        side = sidefiles.load_side_files(packed.sparkSession, side_files_root)
        if doctype == "aaa":
            doc = sidefiles.attach_compare_file_content(doc, side)
        elif doctype == "aaa_model_report":
            doc = sidefiles.attach_model_report_content(doc, side)
    return doc


def resolve_index(path: str, analyzer: str | None = None) -> str:
    """Job dir or segment dir → the segment dir for the requested
    analyzer — the reference's query-time routing between ``IndexName``
    and ``IndexNameStopword`` (solrIndexCreation.ts:877-880): a dual
    ingest job writes both variants, and queries pick one.

    ``analyzer=None`` on a plain segment passes it through unvalidated
    (pre-existing single-segment usage); on a job dir it means the
    default variant. An explicit analyzer is validated against the
    segment manifest so a stopword query never silently runs against
    default-analyzer postings."""
    if os.path.exists(f"{path}/_job_manifest.json"):
        sub = "index_stopword" if analyzer == "stopword" else "index"
        seg = f"{path}/{sub}"
        if not os.path.exists(f"{seg}/_manifest.json"):
            raise ValueError(
                f"ingest job at {path} has no committed "
                f"{analyzer or 'default'!r} segment ({sub}/ absent — "
                "was the job built without --dual?)"
            )
        return seg
    if analyzer is not None:
        from .indexing.build import read_manifest

        built_with = read_manifest(path).get("analyzer", "default")
        if built_with != analyzer:
            raise ValueError(
                f"segment {path} was built with analyzer="
                f"{built_with!r}, requested {analyzer!r}"
            )
    return path


def suggest_entries(doc: DataFrame) -> DataFrame | None:
    """Flatten ``Suggest[]`` → (input, weight) completion rows; None for
    doctypes without suggesters."""
    if "Suggest" not in doc.columns:
        return None
    return (
        doc.select(F.explode("Suggest").alias("s"))
        .select(
            F.explode("s.Input").alias("input"),
            F.col("s.Weight").alias("weight"),
        )
        .filter(F.col("input").isNotNull() & (F.col("input") != ""))
    )


def run_ingest(
    spark: SparkSession,
    packed: DataFrame,
    doctype: str,
    out_dir: str,
    *,
    dual: bool = False,
    store_positions: bool = False,
    templateid: str = "",
    side_files_root: str | None = None,
    num_buckets: int = 16,
    base_doc_id: int = 0,
) -> dict:
    """One job: packed rows in → queryable index + completion table out.

    Layout under ``out_dir``: ``index/`` (default analyzer; with
    ``dual``, also ``index_stopword/``), ``completion/`` (when the
    doctype emits Suggest entries), ``_job_manifest.json`` (atomic —
    written last, the job-level commit point mirroring the segment
    manifest convention)."""
    os.makedirs(out_dir, exist_ok=True)
    doc = compose(
        packed, doctype, templateid=templateid,
        side_files_root=side_files_root,
    )
    if "id" not in doc.columns or "fullcontent" not in doc.columns:
        raise ValueError(
            f"{doctype} composer output lacks id/fullcontent columns"
        )
    # the composed fullcontent is the indexed body (searchboosttext is
    # already injected as the hidden metadata div); id becomes the stable
    # url key that docID assignment orders by
    pages = doc.select(
        F.col("id").alias("url"), F.col("fullcontent").alias("html")
    )
    if dual:
        man_a, man_b = build_index_dual(
            spark, pages, f"{out_dir}/index", f"{out_dir}/index_stopword",
            num_buckets=num_buckets, base_doc_id=base_doc_id,
            store_positions=store_positions,
        )
        manifests = {"index": man_a, "index_stopword": man_b}
    else:
        manifests = {
            "index": build_index(
                spark, pages, f"{out_dir}/index", num_buckets=num_buckets,
                base_doc_id=base_doc_id, store_positions=store_positions,
            )
        }

    sugg = suggest_entries(doc)
    n_completion = 0
    if sugg is not None:
        build_completion_index(sugg, f"{out_dir}/completion")
        n_completion = (
            spark.read.parquet(f"{out_dir}/completion").count()
        )

    job = {
        "doctype": doctype,
        "dual": dual,
        "n_docs": manifests["index"]["n_docs"],
        "quarantined": manifests["index"]["quarantined"],
        "completion_entries": n_completion,
        "manifests": manifests,
    }
    tmp = f"{out_dir}/_job_manifest.json.tmp"
    with open(tmp, "w") as fh:
        json.dump(job, fh, indent=1)
    os.replace(tmp, f"{out_dir}/_job_manifest.json")
    return job


def job_segments(out_dir: str) -> list[str]:
    """The job's live segment chain (base + deltas, build order)."""
    import glob as _glob

    deltas = sorted(_glob.glob(f"{out_dir}/index_delta*"))
    return [f"{out_dir}/index"] + [
        d for d in deltas if os.path.exists(f"{d}/_manifest.json")
    ]


def run_ingest_partial(
    spark: SparkSession,
    packed_changed: DataFrame,
    doctype: str,
    out_dir: str,
    *,
    templateid: str = "",
    side_files_root: str | None = None,
) -> dict:
    """The reference's *PartialIndex job shape (CaseLawsPartialIndex,
    solrIndexCreation.ts:2957-3192): re-index only changed/new documents
    against an existing ingest job.

    Changed packed rows go through the SAME composed pipeline; docs they
    supersede are tombstoned in whichever segment of the chain holds
    them (base or an earlier delta); the new versions land in a fresh
    delta segment with doc ids continuing past the chain's maximum.
    Serving before the next merge is ``topk_segments`` over the chain
    (``indexing.incremental``); ``merge_segments`` compacts back to one.

    Completions merge ADDITIVELY (max weight per input): a superseded
    document's old suggest entries persist until a full rebuild — the
    reference's suggester dictionary behaves the same way between
    rebuilds. Partial mode targets single-variant jobs; dual jobs merge
    per-variant segment chains, which is a full-rebuild operation here.
    """
    job_path = f"{out_dir}/_job_manifest.json"
    with open(job_path) as fh:
        job = json.load(fh)
    if job.get("doctype") != doctype:
        raise ValueError(
            f"job at {out_dir} is doctype {job.get('doctype')!r}, "
            f"got {doctype!r}"
        )
    if job.get("dual"):
        raise ValueError(
            "partial re-index of a dual job is not supported — rebuild "
            "with run_ingest(dual=True) or run partial per variant"
        )
    from .indexing.incremental import reindex_changed_multi

    doc = compose(
        packed_changed, doctype, templateid=templateid,
        side_files_root=side_files_root,
    )
    pages = doc.select(
        F.col("id").alias("url"), F.col("fullcontent").alias("html")
    )
    segments = job_segments(out_dir)
    delta_dir = f"{out_dir}/index_delta{len(segments):04d}"
    man = reindex_changed_multi(spark, segments, pages, delta_dir)

    sugg = suggest_entries(doc)
    comp_dir = f"{out_dir}/completion"
    n_completion = job.get("completion_entries", 0)
    if sugg is not None:
        import shutil

        sugg = sugg.withColumn("display", F.col("input"))
        if os.path.exists(f"{comp_dir}/_completion_manifest.json") or (
            os.path.exists(comp_dir) and os.listdir(comp_dir)
        ):
            old = spark.read.parquet(comp_dir).select(
                "input", "weight", "display"
            )
            merged = old.unionByName(sugg.select("input", "weight", "display"))
        else:
            merged = sugg
        tmp = f"{comp_dir}.tmp"
        build_completion_index(merged, tmp)
        if os.path.exists(comp_dir):
            shutil.rmtree(comp_dir)
        os.replace(tmp, comp_dir)
        n_completion = spark.read.parquet(comp_dir).count()

    job["segments"] = [os.path.basename(s) for s in segments] + [
        os.path.basename(delta_dir)
    ]
    job["n_docs"] = job.get("n_docs", 0) + man["n_docs"]
    job["completion_entries"] = n_completion
    job.setdefault("manifests", {})[os.path.basename(delta_dir)] = man
    tmp = f"{job_path}.tmp"
    with open(tmp, "w") as fh:
        json.dump(job, fh, indent=1)
    os.replace(tmp, job_path)
    return job


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        description="packed doctype table → BM25 index + completions"
    )
    ap.add_argument("--doctype", required=True, choices=sorted(PIPELINES))
    ap.add_argument("--input", required=True, help="packed parquet path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--dual", action="store_true",
                    help="also build the stopword-analyzer segment")
    ap.add_argument("--partial", action="store_true",
                    help="re-index only the input's (changed/new) rows "
                         "against the existing job at --out (the "
                         "reference's *PartialIndex path)")
    ap.add_argument("--positions", action="store_true",
                    help="store positional payloads (phrase queries)")
    ap.add_argument("--templateid", default="")
    ap.add_argument("--sidefiles", default=None,
                    help="attachment-file root (S5 content reads)")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--cores", type=int, default=0,
                    help="local[N] cores (0 = all)")
    args = ap.parse_args(argv)

    from .session import get_spark

    spark = get_spark(
        f"ingest-{args.doctype}", cores=args.cores or None
    )
    packed = spark.read.parquet(args.input)
    if args.partial:
        job = run_ingest_partial(
            spark, packed, args.doctype, args.out,
            templateid=args.templateid, side_files_root=args.sidefiles,
        )
    else:
        job = run_ingest(
            spark, packed, args.doctype, args.out, dual=args.dual,
            store_positions=args.positions, templateid=args.templateid,
            side_files_root=args.sidefiles, num_buckets=args.buckets,
        )
    print(json.dumps(job, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
