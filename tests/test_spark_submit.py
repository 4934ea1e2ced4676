"""The north-rule run shape: `spark-submit --py-files engine.zip` — the
engine must build and query with NO repo checkout on the driver's cwd
(package imported from the shipped zip only)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def test_spark_submit_pyfiles_build_and_query(tmp_path):
    import sys

    sys.path.insert(0, REPO)
    from solr_indexing_spark.synth import write_pages_parquet
    from tools.make_engine_zip import make_zip

    zip_path = str(tmp_path / "engine.zip")
    make_zip(zip_path, repo_root=REPO)
    pages = str(tmp_path / "pages.parquet")
    write_pages_parquet(pages, 300, seed=7)
    # the entry scripts, copied NEXT TO the zip: cwd has no package dir,
    # so a successful run proves the imports came from --py-files
    for f in ("build_index.py", "query.py"):
        shutil.copy(os.path.join(REPO, f), tmp_path / f)
    idx = str(tmp_path / "idx")
    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }

    r = subprocess.run(
        [_spark_submit(), "--master", "local[4]", "--py-files", zip_path,
         str(tmp_path / "build_index.py"), "--pages", pages, "--out", idx,
         "--buckets", "4"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-3000:])
    assert os.path.exists(f"{idx}/_manifest.json")
    with open(f"{idx}/_manifest.json") as fh:
        assert json.load(fh)["n_docs"] == 300

    r2 = subprocess.run(
        [_spark_submit(), "--master", "local[4]", "--py-files", zip_path,
         str(tmp_path / "query.py"), "--index", idx,
         "--query", "salt0000042", "--k", "3"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env,
    )
    assert r2.returncode == 0, (r2.stdout[-1500:], r2.stderr[-3000:])
    hits = [json.loads(l) for l in r2.stdout.replace("\r", "\n").splitlines()
            if l.startswith("{")]
    assert hits and "00000042" in hits[0]["url"]
