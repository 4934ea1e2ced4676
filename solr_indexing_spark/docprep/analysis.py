"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference operators (the reference delegates all text analysis to the
Solr analyzers behind its commented-out ``BulkIndexing`` call,
solrIndexCreation.ts:876-882): language identification, document quality
scoring, token counting, and document fingerprinting — the standard
pre-training corpus-curation stages.

Everything here is a pure Catalyst ``Column`` expression (regexp / HOF /
hash built-ins): JVM-side, whole-stage-codegen'd, zero Python in the hot
path, so the operators survive a 100 TB scan unchanged. The same semantics
are expressible in ANSI SQL, which is how the driver's DuckDB oracle checks
them (``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Unicode word runs — the Catalyst twin of textprep.TOKEN_RE ([^\W_]+):
# letters, digits, combining marks. Java regex and RE2 (DuckDB) agree on
# these \p classes, which keeps Spark/oracle parity.
TOKEN_PATTERN = r"[\p{L}\p{N}\p{M}]+"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sql_tokens(col: Column | str) -> Column:
    """Lowercase Unicode-word tokens as a Catalyst expression (array<string>).

    The JVM-side twin of ``textprep.tokenize`` (the Arrow-UDF engine
    tokenizer) — used by the analysis operators so they stay inside
    whole-stage codegen.
    """
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(TOKEN_PATTERN), 0)


def token_count(col: Column | str) -> Column:
    """Unicode-word token count (the tokenizer the index uses)."""
    return F.size(sql_tokens(col))


def whitespace_token_count(col: Column | str) -> Column:
    """Naive whitespace token count (the 'wc -w' number)."""
    c = F.trim(_c(col))
    return F.when(F.length(c) == 0, F.lit(0)).otherwise(
        F.size(F.split(c, r"\s+"))
    )


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-style token estimate: word runs, digit runs, and each remaining
    non-space symbol count as one token — the standard cheap proxy for
    subword-tokenizer counts when the real tokenizer isn't on the cluster.
    """
    return F.size(
        F.regexp_extract_all(
            F.lower(_c(col)), F.lit(r"[\p{L}\p{M}]+|\p{N}+|[^\p{L}\p{N}\p{M}\s]"), 0
        )
    )


# --- quality scoring ------------------------------------------------------

# Lucene/Solr default English stop set (textprep.STOPWORDS, kept in sync).
_STOP = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with"
).split()


def stopword_hits(tokens: Column) -> Column:
    """Count of stopword tokens (duplicates counted — a ratio needs mass)."""
    stop = F.array(*[F.lit(w) for w in _STOP])
    return F.size(F.filter(tokens, lambda t: F.array_contains(stop, t)))


def quality_metrics(col: Column | str) -> list[Column]:
    """The classic Gopher/C4-style per-document quality signals as columns:

    n_chars, n_tokens, mean_token_len, punct_ratio (non-word non-space chars
    per char), digit_ratio, stopword_ratio, uniq_token_ratio — each a pure
    Catalyst expression over the text column.
    """
    c = _c(col)
    toks = sql_tokens(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    n_tokf = n_tokens.cast("double")
    safe_tok = F.greatest(n_tokf, F.lit(1.0))
    safe_chr = F.greatest(n_chars.cast("double"), F.lit(1.0))
    total_tok_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    punct = F.size(
        F.regexp_extract_all(c, F.lit(r"[^\p{L}\p{N}\p{M}\s]"), 0)
    )
    digits = F.size(F.regexp_extract_all(c, F.lit(r"\p{N}"), 0))
    return [
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(total_tok_chars / safe_tok, 4).alias("mean_token_len"),
        F.round(punct / safe_chr, 4).alias("punct_ratio"),
        F.round(digits / safe_chr, 4).alias("digit_ratio"),
        F.round(stopword_hits(toks) / safe_tok, 4).alias("stopword_ratio"),
        F.round(F.size(F.array_distinct(toks)) / safe_tok, 4).alias(
            "uniq_token_ratio"
        ),
    ]


def quality_score(col: Column | str) -> Column:
    """Composite 0..1 quality score (heuristic, deterministic):

    rewards in-range length and stopword presence, penalizes punctuation
    and repetition. Tuned for filtering, not ranking — the standard
    'keep if score >= τ' pre-training gate.
    """
    c = _c(col)
    toks = sql_tokens(c)
    n_tok = F.size(toks).cast("double")
    safe_tok = F.greatest(n_tok, F.lit(1.0))
    len_ok = F.when((n_tok >= 20) & (n_tok <= 100000), F.lit(1.0)).otherwise(
        n_tok / F.lit(20.0)
    )
    len_ok = F.least(len_ok, F.lit(1.0))
    stop_ratio = stopword_hits(toks) / safe_tok
    stop_ok = F.least(stop_ratio * 4.0, F.lit(1.0))
    uniq = F.size(F.array_distinct(toks)) / safe_tok
    punct = (
        F.size(F.regexp_extract_all(c, F.lit(r"[^\p{L}\p{N}\p{M}\s]"), 0))
        / F.greatest(F.length(c).cast("double"), F.lit(1.0))
    )
    punct_ok = F.greatest(F.lit(0.0), F.lit(1.0) - punct * 4.0)
    return F.round(
        (len_ok + stop_ok + F.least(uniq * 2.0, F.lit(1.0)) + punct_ok) / 4.0, 4
    )


# --- language identification ---------------------------------------------

# Marker-word lists per language (top closed-class words; public knowledge).
# An n-gram-free heuristic: count marker hits per language over the token
# stream, argmax with deterministic tie-break on language code. This is the
# cheap first-pass langid of web-corpus pipelines (fastText et al. come
# later, off-cluster).
LANG_MARKERS: dict[str, list[str]] = {
    "de": "der die das und ist nicht mit für von ein eine zu im auf als auch".split(),
    "en": "the and of to in is that it for was with as are this be on not".split(),
    "es": "el la los las de que y en un una es por con para no se del".split(),
    "fr": "le la les de et un une est que dans pour qui au du des ne pas".split(),
}


def lang_hits(tokens: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(w) for w in LANG_MARKERS[lang]])
    return F.size(F.filter(tokens, lambda t: F.array_contains(markers, t)))


def lang_id(col: Column | str, min_hits: int = 1) -> Column:
    """Predicted language code, or 'und' when no list scores >= min_hits.

    Ties break alphabetically (deterministic — rank-stability matters more
    than accuracy for a pipeline gate).
    """
    toks = sql_tokens(col)
    hits = {code: lang_hits(toks, code) for code in sorted(LANG_MARKERS)}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # reversed: earlier alphabetical codes win ties by overwriting later ones
    for code in sorted(hits, reverse=True):
        out = F.when((hits[code] == best) & (best >= min_hits), F.lit(code)).otherwise(out)
    return out


# --- fingerprinting -------------------------------------------------------


def md5_prefix_long(col: Column | str, seed: str = "") -> Column:
    """Deterministic 60-bit integer hash: first 15 hex chars of md5.

    Engine-portable: DuckDB computes the same value as
    ``('0x' || substr(md5(x), 1, 15))::bigint`` — the cross-engine hash
    primitive the dedup/minhash operators build on. 60 bits keeps it
    positive in a signed 64-bit int in both engines.
    """
    c = _c(col).cast("string")
    if seed:
        c = F.concat(F.lit(seed), F.lit(":"), c)
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


def normalize_for_fingerprint(col: Column | str) -> Column:
    """Canonical text form for content hashing: lowercase, word chars only,
    single-space joined — so formatting/punctuation changes don't change
    the fingerprint."""
    return F.array_join(sql_tokens(col), " ")


def doc_fingerprint(col: Column | str) -> Column:
    """60-bit content fingerprint of the normalized text."""
    return md5_prefix_long(normalize_for_fingerprint(col))


def rolling_fingerprints(col: Column | str, window: int = 8, keep: int = 4) -> Column:
    """Winnowing-style selective fingerprints: hash every ``window``-token
    shingle, keep the ``keep`` smallest hashes (sorted) — a compact
    order-insensitive sketch for near-duplicate candidate generation
    (Schleimer et al., SIGMOD 2003 'winnowing' idea, simplified).
    Returns array<long> of at most ``keep`` hashes.
    """
    toks = sql_tokens(col)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    shingles = F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, window))
    )
    hashes = F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s.cast("binary")), 1, 15), 16, 10).cast(
            "long"
        ),
    )
    return F.slice(F.array_sort(F.array_distinct(hashes)), 1, keep)
