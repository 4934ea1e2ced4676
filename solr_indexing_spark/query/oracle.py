"""Pure-Python reference BM25 scorer — the rank-identity oracle.

This is the "reference scorer" of the north rule: a naive dict-based inverted
index + textbook BM25 (k1=1.2, b=0.75, idf = ln(1 + (N-df+0.5)/(df+0.5))),
Lucene-parameterized per SURVEY.md §7.4. Engine top-k (docIDs and scores)
must match this rank-identically (score tol 1e-6) on the fixture query set.

Deterministic: docIDs assigned by ascending url; per-doc score accumulated
over query terms in sorted-term order; ties broken by ascending doc_id.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from .. import B, K1
from ..textprep import tokenize_str


class OracleIndex:
    def __init__(
        self, pages: pd.DataFrame, base_doc_id: int = 0, tokenizer=tokenize_str
    ):
        """pages: DataFrame with url + text columns (synth.gen_pages shape).

        ``tokenizer`` selects the analyzer variant (``tokenize_str`` default,
        ``tokenize_stop_str`` for the stopword index)."""
        ordered = pages.sort_values("url", kind="stable").reset_index(drop=True)
        self.urls = list(ordered["url"])
        self._texts = list(ordered["text"])
        self.doc_ids = list(range(base_doc_id, base_doc_id + len(ordered)))
        self.tokenizer = tokenizer
        self.postings: dict[str, dict[int, int]] = {}
        self.doclen: dict[int, int] = {}
        for doc_id, text in zip(self.doc_ids, ordered["text"]):
            toks = tokenizer(text)
            self.doclen[doc_id] = len(toks)
            for term, tf in Counter(toks).items():
                self.postings.setdefault(term, {})[doc_id] = tf
        self.n_docs = len(ordered)
        self.avgdl = (
            sum(self.doclen.values()) / self.n_docs if self.n_docs else 1.0
        )

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, {}))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def score_all(self, query: str) -> dict[int, float]:
        """Full disjunctive BM25 scores for every matching doc."""
        terms = sorted(set(self.tokenizer(query)))
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w_idf = self.idf(term)
            for doc_id, tf in plist.items():
                dl = self.doclen[doc_id]
                norm = tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))
                scores[doc_id] = scores.get(doc_id, 0.0) + w_idf * norm
        return scores

    def topk(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        scores = self.score_all(query)
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    def phrase_topk(self, phrase: str, k: int = 10) -> list[tuple[int, float]]:
        """Exact-phrase matches (token adjacency) scored by BM25 over the
        phrase's distinct terms — the oracle for query/phrase.py."""
        terms = self.tokenizer(phrase)
        if not terms:
            return []
        uniq = sorted(set(terms))
        if any(t not in self.postings for t in uniq):
            return []
        # candidate docs: conjunction
        docs = set(self.postings[uniq[0]])
        for t in uniq[1:]:
            docs &= set(self.postings[t])
        # re-tokenize candidate docs for adjacency (oracle keeps no positions)
        matches = []
        for doc_id in sorted(docs):
            i = self.doc_ids.index(doc_id)
            toks = self.tokenizer(self._texts[i])
            n, m = len(toks), len(terms)
            if any(toks[p : p + m] == terms for p in range(0, n - m + 1)):
                score = math.fsum(
                    self.idf(t)
                    * self.postings[t][doc_id]
                    * (K1 + 1.0)
                    / (
                        self.postings[t][doc_id]
                        + K1 * (1.0 - B + B * self.doclen[doc_id] / self.avgdl)
                    )
                    for t in uniq
                )
                matches.append((doc_id, score))
        return sorted(matches, key=lambda kv: (-kv[1], kv[0]))[:k]
