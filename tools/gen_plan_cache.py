"""Regenerate the committed analyzed-plan cache blobs for the 13 composed
document pipelines (solr_indexing_spark/_plan_cache/).

Runs every ``dp_*_assembly`` entry from ``__spark_entry__.py`` once with
cache WRITES enabled: each pipeline composer persists the analyzed chain
of its plan keyed on (source digest, params, input schema). The input
schema an assembly feeds its composer is the same at every scale factor,
so blobs generated here at sf0.001 hit for the driver gate (sf0.01) and
bench (sf0.1) alike.

Run after any edit to the docprep modules (the source digest changes, so
stale blobs simply stop matching — they are garbage, not a hazard; this
tool also sweeps them):

    python tools/gen_plan_cache.py
"""

from __future__ import annotations

import glob
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["SPARK_GRAFT_PLAN_CACHE_WRITE"] = "1"


def main() -> None:
    from solr_indexing_spark.session import get_spark
    from solr_indexing_spark import plancache
    import __spark_entry__ as entry

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    spark = get_spark("gen_plan_cache", cores=4, shuffle_partitions=8)
    blob_dir = os.path.join(
        REPO, "solr_indexing_spark", "_plan_cache"
    )
    before = set(glob.glob(os.path.join(blob_dir, "*.plan.gz")))

    qs = entry.queries()
    names = [k for k in qs if k.startswith("dp_") and k.endswith("_assembly")]
    for name in names:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.limit(1).collect()  # force analysis end-to-end
        print(f"{name}: {time.time() - t0:.1f}s")

    after = set(glob.glob(os.path.join(blob_dir, "*.plan.gz")))
    stale = before - after
    fresh = after - before
    # sweep blobs whose fingerprint no longer matches any live pipeline:
    # a stale digest means the name-prefixed file was not rewritten
    fresh_names = {os.path.basename(p).rsplit("-", 1)[0] for p in fresh}
    for p in sorted(before & after):
        nm = os.path.basename(p).rsplit("-", 1)[0]
        if nm in fresh_names:
            os.unlink(p)
            print(f"swept stale {os.path.basename(p)}")
    print(f"{len(fresh)} blob(s) written to {blob_dir}")
    if not plancache.cache_enabled():
        print("WARNING: SPARK_GRAFT_PLAN_CACHE=0 — blobs written but unused")
    spark.stop()


if __name__ == "__main__":
    main()
