"""Generate the committed side-file fixture corpus (fixtures/sidefiles/).

The S5 oracle entries (dp_aaa_assembly, dp_modelreport_assembly) join
document rows against files on disk: Spark reads them via the binaryFile
source (sidefiles.load_side_files), DuckDB via read_text() in the oracle
SQL. Both sides must see the same deterministic corpus, so it is
generated here and committed.

Coverage is deliberately partial: AAA attachments exist only for
k % 3 != 1 and model-report bodies only for k % 4 != 2, so the
existence-gate semantics (reference's ``if (File.Exists)``) are
exercised by both the hit and the miss branch at every scale factor.

    python tools/gen_sidefiles.py
"""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "fixtures", "sidefiles")

# the dp_*_assembly entries filter o_orderkey < 300; sf0.1 keeps every
# key below this bound present, so 300 covers all scale factors
KEY_BOUND = 300


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for f in os.listdir(OUT):
        os.unlink(os.path.join(OUT, f))
    n = 0
    for k in range(KEY_BOUND):
        if k % 3 != 1:
            with open(
                os.path.join(OUT, f"aaa_cmp_{k}.txt"), "w", newline=""
            ) as f:
                f.write(f"Comparison text for standard {k}: para {k % 7}.")
            n += 1
        if k % 4 != 2:
            with open(
                os.path.join(OUT, f"mr_{k}.txt"), "w", newline=""
            ) as f:
                f.write(
                    f"<report><body>Model report {k} full text"
                    f" rev {k % 11}</body></report>"
                )
            n += 1
    print(f"{n} fixture files in {OUT}")


if __name__ == "__main__":
    main()
