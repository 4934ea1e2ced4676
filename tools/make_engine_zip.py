"""Package the engine for ``spark-submit --py-files`` (the north-rule run
shape): one zip of the ``solr_indexing_spark`` package, importable by
executors and the driver with no repo checkout on the workers.

    python tools/make_engine_zip.py [out.zip]

Only ``.py`` sources and the committed ``_plan_cache`` payloads go in —
no tests, no caches, no bytecode.
"""

from __future__ import annotations

import os
import sys
import zipfile


def make_zip(out_path: str, repo_root: str | None = None) -> str:
    root = repo_root or os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    )
    pkg = os.path.join(root, "solr_indexing_spark")
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in sorted(filenames):
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(dirpath, fn)
                rel = os.path.relpath(full, root)
                zf.write(full, rel)
    return out_path


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "engine.zip"
    print(make_zip(out))
