"""Generate the frozen reference query set + golden top-k (FIXTURES.md §2).

25 queries over the 500-doc seed-42 synthetic corpus: 10 single-term
(head/mid/tail df), 10 multi-term (2-4 terms), 3 unicode/case variants,
2 out-of-vocabulary. Golden top-10 (docIDs + BM25 scores) from the
pure-Python oracle scorer. Run once; outputs are committed.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from solr_indexing_spark.query.oracle import OracleIndex
from solr_indexing_spark.synth import gen_pages

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    pdf = gen_pages(500, seed=42)
    oracle = OracleIndex(pdf)

    df_sorted = sorted(oracle.postings.items(), key=lambda kv: -len(kv[1]))
    terms = [t for t, _ in df_sorted]
    head = terms[:4]
    mid = terms[len(terms) // 3 : len(terms) // 3 + 3]
    tail = [t for t in terms if len(oracle.postings[t]) == 1][:3]

    queries = []
    for t in head + mid + tail:  # 10 single-term
        queries.append(t)
    # 10 multi-term
    queries += [
        f"{head[0]} {mid[0]}",
        f"{head[1]} {tail[0]}",
        f"{mid[0]} {mid[1]} {mid[2]}",
        f"{head[0]} {head[1]} {head[2]} {head[3]}",
        f"{tail[0]} {tail[1]}",
        f"{head[2]} {mid[1]}",
        f"{mid[2]} {tail[2]}",
        f"{head[3]} {mid[0]} {tail[1]}",
        f"{head[0]} {head[0]} {mid[1]}",  # repeated term
        f"{mid[1]} {head[1]}",
    ]
    # 3 unicode/case variants
    queries += ["café über", head[0].upper(), f"東京 {mid[0].capitalize()}"]
    # 2 OOV
    queries += ["zzzznotavocabword", "qqq www eee"]
    assert len(queries) == 25

    os.makedirs(f"{HERE}/fixtures", exist_ok=True)
    with open(f"{HERE}/fixtures/queries.jsonl", "w") as qf, open(
        f"{HERE}/fixtures/golden_topk.jsonl", "w"
    ) as gf:
        for qid, q in enumerate(queries):
            qf.write(json.dumps({"qid": qid, "query": q, "k": 10}) + "\n")
            golden = [
                {"doc_id": d, "score": round(s, 10)}
                for d, s in oracle.topk(q, k=10)
            ]
            gf.write(json.dumps({"qid": qid, "query": q, "topk": golden}) + "\n")
    print(f"wrote 25 queries + golden top-k to {HERE}/fixtures/")


if __name__ == "__main__":
    main()
