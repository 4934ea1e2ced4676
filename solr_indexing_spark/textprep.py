"""M0 — text preparation: HTML→text extraction and tokenization.

Reference semantics re-expressed (not ported):
- HTML footnote/header stripping: the reference removes ``div.footprint``
  nodes and ``<footnote>…</footnote>`` spans from ``fullcontent``
  (``solrIndexCreation.ts:776-798,2776-2806``) and strips ``<header>`` blocks
  via ``RemovedHeaderTag`` (``common.ts:283-301``). Our ``extract_text``
  generalizes this to full HTML→text with those same exclusions.
- Tokenization is the from-scratch half (the reference delegates it to the
  Solr analyzers behind ``BulkIndexing``, ``solrIndexCreation.ts:877-880``):
  lowercase fold + Unicode word-character runs. Deterministic and versioned —
  the per-url byte-identity invariant (BASELINE.json input_hint) depends on it.

Both functions exist in two forms with identical semantics:
pure-Python (``*_str``, used by the test oracle) and Arrow-vectorized pandas
UDFs (the engine path; batches cross JVM↔Python as Arrow, no per-row Python
round trips through py4j).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EXTRACTOR_VERSION = "extract-v1-htmlparser"
TOKENIZER_VERSION = "tok-v1-lower-unicode-word"

# Unicode word-character runs, underscore excluded (letters, digits, marks).
TOKEN_RE = re.compile(r"[^\W_]+", re.UNICODE)

# Tags whose entire content is excluded from extracted text.
_SKIP_TAGS = frozenset({"header", "footnote", "script", "style", "head", "title"})
# Void elements never pushed on the open-tag stack.
_VOID_TAGS = frozenset(
    {"br", "hr", "img", "meta", "link", "input", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)
# class attribute values whose element subtree is excluded (reference strips
# div.footprint: solrIndexCreation.ts:2781-2798).
_SKIP_CLASSES = frozenset({"footprint"})

# Block-level elements: entering/leaving one is a word boundary (inline tags
# like <b>/<i>/<span> are not, so they can't split words).
_BLOCK_TAGS = frozenset(
    {"p", "div", "br", "li", "ul", "ol", "tr", "td", "th", "table", "section",
     "article", "header", "footer", "nav", "aside", "footnote", "blockquote",
     "pre", "h1", "h2", "h3", "h4", "h5", "h6", "body", "html", "hr", "form",
     "figure", "figcaption", "main", "dl", "dt", "dd"}
)


class _TextExtractor(HTMLParser):
    """Stream HTML, collecting text outside skip-listed subtrees.

    convert_charrefs=True (default) decodes entities (&amp; &#39; …) into
    characters inside the data stream — the reference's documents carry
    such entities (e.g. ``replace("&#39;","'")`` at solrIndexCreation.ts:2635).
    """

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.pieces: list[str] = []
        # stack of (tag, is_skipped); skip depth counter for O(1) checks
        self._stack: list[tuple[str, bool]] = []
        self._skip_depth = 0

    def _tag_skipped(self, tag: str, attrs) -> bool:
        if tag in _SKIP_TAGS:
            return True
        for name, value in attrs:
            if name == "class" and value:
                if _SKIP_CLASSES & set(value.split()):
                    return True
        return False

    def handle_starttag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self.pieces.append(" ")
        if tag in _VOID_TAGS:
            return
        skipped = self._skip_depth > 0 or self._tag_skipped(tag, attrs)
        self._stack.append((tag, skipped))
        if skipped:
            self._skip_depth += 1

    def handle_endtag(self, tag):
        if tag in _BLOCK_TAGS:
            self.pieces.append(" ")
        # pop to the matching open tag (tolerates mis-nesting like real HTML)
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for _, skipped in self._stack[i:]:
                    if skipped:
                        self._skip_depth -= 1
                del self._stack[i:]
                break

    def handle_data(self, data):
        if self._skip_depth == 0 and data:
            self.pieces.append(data)


def extract_text_str(html: bytes | str | None) -> str:
    """HTML → text. Whitespace-normalized (runs collapse to single space,
    stripped). Deterministic; the unit oracle for the byte-identity gate."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return " ".join("".join(parser.pieces).split())


def tokenize_str(text: str | None) -> list[str]:
    """Lowercase + Unicode word-run tokenizer (TOKENIZER_VERSION)."""
    if not text:
        return []
    return TOKEN_RE.findall(text.lower())


@F.pandas_udf(T.StringType())
def extract_text(html: pd.Series) -> pd.Series:
    return html.map(extract_text_str)


_SAFE_RESULT = T.StructType(
    [
        T.StructField("text", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


@F.pandas_udf(_SAFE_RESULT)
def extract_text_safe(html: pd.Series) -> pd.DataFrame:
    """Per-row error-captured extraction — the dead-letter path.

    The reference wraps every document in try/catch and appends failing ids
    to a log file (Common.LogErrorId, common.ts:304-326; call sites e.g.
    solrIndexCreation.ts:866-871): one bad row must never kill the batch.
    Here the catch lives inside the Arrow UDF; rows with a non-null
    ``error`` are routed to a quarantine table instead of the index.
    """
    texts, errors = [], []
    for raw in html:
        try:
            t = extract_text_str(raw)
        except Exception as ex:  # noqa: BLE001 — the whole point
            texts.append(None)
            errors.append(f"extract: {type(ex).__name__}: {ex}")
            continue
        if not t and raw is not None and len(raw) > 0:
            texts.append(None)
            errors.append("extract: empty result from non-empty html")
        else:
            texts.append(t)
            errors.append(None)
    return pd.DataFrame({"text": texts, "error": errors})


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize(text: pd.Series) -> pd.Series:
    return text.fillna("").str.lower().str.findall(TOKEN_RE)


_TF_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
        ]
    )
)


@F.pandas_udf(_TF_STRUCT)
def tokenize_tf(text: pd.Series) -> pd.Series:
    """Per-document term frequencies: array<struct<term,tf>>.

    Doc-local tf aggregation INSIDE the tokenizer (the Lucene per-doc
    inverter move): the index build then shuffles one row per distinct
    (doc, term) instead of one per token occurrence — for typical web text
    a 2-3× cut in shuffle/sort volume, which is the index build's
    dominant cost. Same token semantics as ``tokenize``.
    """
    from collections import Counter

    out = []
    for toks in text.fillna("").str.lower().str.findall(TOKEN_RE):
        # Counter's C-level _count_elements: ~10× faster than sorting-based
        # unique on object arrays for short docs
        out.append(list(Counter(toks).items()) if toks else [])
    return pd.Series(out)


# Stopword list for the second analyzer variant (the reference maintains a
# parallel stopword index: IndexNameStopword, solrIndexCreation.ts:877-880).
# Public Lucene/Solr default English stop set.
STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def tokenize_stop_str(text: str | None) -> list[str]:
    return [t for t in tokenize_str(text) if t not in STOPWORDS]


@F.pandas_udf(T.ArrayType(T.StringType()))
def tokenize_stop(text: pd.Series) -> pd.Series:
    sw = STOPWORDS
    return (
        text.fillna("")
        .str.lower()
        .str.findall(TOKEN_RE)
        .map(lambda toks: [t for t in toks if t not in sw])
    )


_TF_DUAL_STRUCT = T.StructType(
    [
        T.StructField("entries", _TF_STRUCT, False),
        T.StructField("dl_stop", T.IntegerType(), False),
    ]
)


@F.pandas_udf(_TF_DUAL_STRUCT)
def tokenize_tf_dual(text: pd.Series) -> pd.DataFrame:
    """``tokenize_tf`` plus the stopword-analyzer doclen, one tokenize.

    The dual build's posting stream needs doclen_stop on every exploded
    row; deriving it in Catalyst (aggregate over filter of the tf array)
    measured ~13 s of interpreted higher-order-function time per 20k-doc
    build — the Counter is already in hand here, so the subtraction is
    free."""
    from collections import Counter

    sw = STOPWORDS
    ents, dls = [], []
    for toks in text.fillna("").str.lower().str.findall(TOKEN_RE):
        c = Counter(toks)
        ents.append(list(c.items()) if toks else [])
        # intersect the 33-key stop set with the DISTINCT terms: O(33)
        # hash lookups per doc, not one membership test per token
        dls.append(len(toks) - sum(c[t] for t in sw & c.keys()))
    return pd.DataFrame({"entries": ents, "dl_stop": dls})


_TFPOS_DUAL_STRUCT_FIELDS = [
    T.StructField("term", T.StringType(), False),
    T.StructField("tf", T.IntegerType(), False),
    T.StructField("positions", T.ArrayType(T.IntegerType()), False),
]
_TFPOS_DUAL_STRUCT = T.StructType(
    [
        T.StructField(
            "entries",
            T.ArrayType(T.StructType(_TFPOS_DUAL_STRUCT_FIELDS)),
            False,
        ),
        T.StructField("dl_stop", T.IntegerType(), False),
    ]
)


@F.pandas_udf(_TFPOS_DUAL_STRUCT)
def tokenize_tf_pos_dual(text: pd.Series) -> pd.DataFrame:
    """Positional twin of ``tokenize_tf_dual`` (default-analyzer
    positions; the stopword variant's position gaps survive downstream
    filtering by term)."""
    sw = STOPWORDS
    ents, dls = [], []
    for toks in text.fillna("").str.lower().str.findall(TOKEN_RE):
        e = _tf_pos_of(toks) if toks else []
        ents.append(e)
        dls.append(
            len(toks) - sum(tf for t, tf, _ in e if t in sw)
        )
    return pd.DataFrame({"entries": ents, "dl_stop": dls})


@F.pandas_udf(T.ArrayType(T.IntegerType()))
def doclens_dual(text: pd.Series) -> pd.Series:
    """[doclen_default, doclen_stopword] from ONE tokenize pass — the
    dual-analyzer build's docs stage (build.py:build_docs_dual) computes
    both segments' norms without tokenizing the corpus twice. The
    stopword doclen is the default token count minus stop hits because
    the stopword analyzer is the default stream filtered by STOPWORDS."""
    from collections import Counter

    sw = STOPWORDS
    out = []
    for toks in text.fillna("").str.lower().str.findall(TOKEN_RE):
        n = len(toks)
        if n:
            c = Counter(toks)
            n_stop = sum(c[t] for t in sw & c.keys())
        else:
            n_stop = 0
        out.append([n, n - n_stop])
    return pd.Series(out)


@F.pandas_udf(_TF_STRUCT)
def tokenize_tf_stop(text: pd.Series) -> pd.Series:
    """Stopword-analyzer twin of ``tokenize_tf`` (doclen/tf exclude stops)."""
    from collections import Counter

    sw = STOPWORDS
    out = []
    for toks in text.fillna("").str.lower().str.findall(TOKEN_RE):
        kept = [t for t in toks if t not in sw]
        out.append(list(Counter(kept).items()) if kept else [])
    return pd.Series(out)


_TFPOS_STRUCT = T.ArrayType(
    T.StructType(
        [
            T.StructField("term", T.StringType(), False),
            T.StructField("tf", T.IntegerType(), False),
            T.StructField("positions", T.ArrayType(T.IntegerType()), False),
        ]
    )
)


def _tf_pos_of(toks: list[str]) -> list[tuple[str, int, list[int]]]:
    d: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        d.setdefault(t, []).append(i)
    return [(t, len(ps), ps) for t, ps in d.items()]


@F.pandas_udf(_TFPOS_STRUCT)
def tokenize_tf_pos(text: pd.Series) -> pd.Series:
    """Positional twin of ``tokenize_tf``: per-doc (term, tf, positions).

    Positions are token indices under the default analyzer — the payload a
    phrase query needs (adjacency = consecutive indices).
    """
    return pd.Series(
        [
            _tf_pos_of(toks) if toks else []
            for toks in text.fillna("").str.lower().str.findall(TOKEN_RE)
        ]
    )


@F.pandas_udf(_TFPOS_STRUCT)
def tokenize_tf_pos_stop(text: pd.Series) -> pd.Series:
    """Stopword positional variant: positions are indices in the ORIGINAL
    token stream (Lucene keeps position gaps across removed stopwords so
    phrases spanning a stopword don't falsely tighten)."""
    sw = STOPWORDS
    out = []
    for toks in text.fillna("").str.lower().str.findall(TOKEN_RE):
        d: dict[str, list[int]] = {}
        for i, t in enumerate(toks):
            if t not in sw:
                d.setdefault(t, []).append(i)
        out.append([(t, len(ps), ps) for t, ps in d.items()])
    return pd.Series(out)


def tokenize_offsets_str(text: str | None) -> list[tuple[int, str]]:
    """Query-side (position, term) pairs under the default analyzer —
    positions are plain token indices."""
    return list(enumerate(tokenize_str(text)))


def tokenize_stop_offsets_str(text: str | None) -> list[tuple[int, str]]:
    """Stopword-analyzer (position, term) pairs PRESERVING position
    increments across removed stopwords — the Lucene position-gap
    semantics the index side stores (``tokenize_tf_pos_stop``). A phrase
    like "president of india" keeps india at position 2, so it matches
    documents indexed with the same gap. (A gapless 0..m-1 numbering here
    would make stopword-spanning phrases unmatchable.)"""
    sw = STOPWORDS
    return [(i, t) for i, t in enumerate(tokenize_str(text)) if t not in sw]


ANALYZERS = {
    # analyzer name →
    #   (tokens UDF, per-doc tf UDF, query-side str tokenizer, tf+pos UDF)
    "default": (tokenize, tokenize_tf, tokenize_str, tokenize_tf_pos),
    "stopword": (
        tokenize_stop, tokenize_tf_stop, tokenize_stop_str, tokenize_tf_pos_stop
    ),
}

# analyzer name → query-side gapped (position, term) tokenizer; the phrase
# scorer MUST use these (not ANALYZERS[...][2]) so query positions agree
# with stored index positions under stopword removal.
QUERY_OFFSET_TOKENIZERS = {
    "default": tokenize_offsets_str,
    "stopword": tokenize_stop_offsets_str,
}
