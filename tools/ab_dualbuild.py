"""Isolated interleaved A/B for the round-4 dual-build bench regression.

Reproduces BENCH_r04 q_index_build_dual conditions exactly: the synth
corpus (20k pages, seed 7), num_buckets=16, local[32] — then runs
[single-default, single-stopword, dual] REPEATS times interleaved and
prints per-repeat timings plus the dual-vs-two-builds ratio per repeat,
with 1-minute load averages recorded before each leg.

Usage: python tools/ab_dualbuild.py [repeats] [stopword_frac]

A second positional arg > 0 generates the corpus with that stopword
fraction (the realistic web-text shape) instead of the zero-stopword
worst case.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    stopword_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from solr_indexing_spark.indexing.build import build_index, build_index_dual
    from solr_indexing_spark.session import get_spark
    from solr_indexing_spark.synth import write_pages_parquet

    spark = get_spark("ab_dualbuild", cores=cpus)
    work = tempfile.mkdtemp(prefix="ab_dual_")
    synth_path = f"{work}/pages_synth.parquet"
    write_pages_parquet(synth_path, 20000, seed=7, stopword_frac=stopword_frac)
    pages = spark.read.parquet(synth_path)

    results = []
    for r in range(repeats):
        row: dict = {"repeat": r}
        legs = [
            ("single_default", lambda: build_index(
                spark, pages, f"{work}/r{r}_a", num_buckets=16)),
            ("single_stop", lambda: build_index(
                spark, pages, f"{work}/r{r}_b", num_buckets=16,
                analyzer="stopword")),
            ("dual", lambda: build_index_dual(
                spark, pages, f"{work}/r{r}_c", f"{work}/r{r}_d",
                num_buckets=16)),
        ]
        # rotate leg order per repeat: this box's co-tenant load ramps over
        # a run, so a fixed order systematically charges the last leg the
        # hottest box — rotation distributes the ramp across legs
        legs = legs[r % 3:] + legs[: r % 3]
        for leg, fn in legs:
            row[f"load_before_{leg}"] = round(os.getloadavg()[0], 1)
            t0 = time.monotonic()
            fn()
            row[leg] = round(time.monotonic() - t0, 3)
        row["ratio"] = round(
            row["dual"] / (row["single_default"] + row["single_stop"]), 3
        )
        results.append(row)
        print(json.dumps(row), flush=True)
        for sub in ("a", "b", "c", "d"):
            shutil.rmtree(f"{work}/r{r}_{sub}", ignore_errors=True)

    ratios = sorted(x["ratio"] for x in results)
    print(json.dumps({
        "repeats": repeats,
        "median_ratio": ratios[len(ratios) // 2],
        "min_ratio": ratios[0],
        "max_ratio": ratios[-1],
    }), flush=True)
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
