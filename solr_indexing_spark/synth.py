"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Shape matches BASELINE.json input_hint exactly:
    pages(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Properties:
- seeded numpy PCG64 → fully reproducible for any (n, seed, skew);
- `text` is Zipf-sampled (~5k vocab, s≈1.07), 20–800 tokens/doc, mixed case,
  some non-ASCII (é, ü, CJK) + a per-doc unique salt term;
- `html` wraps `text` with the constructs the reference strips — a
  ``<header>`` block (common.ts:283-301), a ``div class="footprint"`` node and
  a ``<footnote>`` span (solrIndexCreation.ts:776-798,2776-2806) — plus HTML
  entities; ``extract_text(html)`` must return `text` byte-identically;
- optional skew mode plants a designated head term in 90% of docs
  (salting test, SURVEY.md §5.2-6).
"""

from __future__ import annotations

import html as _html

import numpy as np
import pandas as pd

VOCAB_SIZE = 5000
ZIPF_S = 1.07
SKEW_TERM = "skewhead"

_SYLLABLES = [
    "ta", "ri", "lo", "mek", "sun", "var", "pel", "dor", "nis", "qua",
    "bel", "tor", "min", "gal", "rex", "ful", "zan", "cor", "vim", "hax",
]
_UNICODE_WORDS = ["café", "über", "naïve", "résumé", "東京", "データ", "straße"]


def _make_vocab(size: int = VOCAB_SIZE) -> list[str]:
    rng = np.random.default_rng(7)
    words, seen = [], set()
    while len(words) < size:
        n_syl = int(rng.integers(2, 5))
        w = "".join(_SYLLABLES[int(i)] for i in rng.integers(0, len(_SYLLABLES), n_syl))
        if w not in seen:
            seen.add(w)
            words.append(w)
    # splice unicode words into mid-frequency ranks for tokenizer coverage
    for i, uw in enumerate(_UNICODE_WORDS):
        words[50 + i * 97] = uw
    return words


_VOCAB = _make_vocab()

_ZIPF_P = 1.0 / np.arange(1, VOCAB_SIZE + 1) ** ZIPF_S
_ZIPF_P /= _ZIPF_P.sum()


def _slug(i: int) -> str:
    return f"{i:08d}-{_VOCAB[i % 211]}"


def render_html(text: str, i: int, site: int) -> bytes:
    """Wrap text in HTML with skip-listed constructs and entities.

    Entity round-trip: a few literal characters in body text are emitted as
    character references; the extractor's entity decoding restores them.
    """
    words = text.split(" ")
    third = max(1, len(words) // 3)
    p1 = _html.escape(" ".join(words[:third]))
    p2 = _html.escape(" ".join(words[third : 2 * third]))
    p3 = _html.escape(" ".join(words[2 * third :]))
    # force some explicit numeric character references into p2
    p2 = p2.replace("a", "&#97;", 1) if i % 3 == 0 else p2
    return (
        "<html><head><title>synthetic page {i}</title>"
        '<meta charset="utf-8"></head><body>\n'
        "<header>site {site} navigation menu</header>\n"
        '<div class="footprint">footprint tracking pixel {i}</div>\n'
        "<div><p>{p1}</p>\n<p>{p2}</p>\n<p>{p3}</p></div>\n"
        "<footnote>citation note {i}</footnote>\n"
        "</body></html>"
    ).format(i=i, site=site, p1=p1, p2=p2, p3=p3).encode("utf-8")


def gen_pages(
    n: int, seed: int = 42, skew: bool = False, stopword_frac: float = 0.0
) -> pd.DataFrame:
    """Generate n pages as a pandas DataFrame (columnar, vectorized).

    ``stopword_frac`` > 0 interleaves English stopwords (textprep.STOPWORDS)
    so roughly that fraction of each doc's tokens are stop terms — the
    realistic web-text shape (~40% of running English text is stopwords),
    where the stopword-analyzer variant's posting stream is much smaller
    than the default's. Drawn from an independent rng stream so
    ``stopword_frac=0`` output stays byte-identical to the historical
    corpus for every (n, seed) — golden anchors and test fixtures depend
    on that."""
    rng = np.random.default_rng(seed)
    lens = rng.integers(20, 801, size=n)
    total = int(lens.sum())
    token_ids = rng.choice(VOCAB_SIZE, size=total, p=_ZIPF_P)
    upper_mask = rng.random(total) < 0.02  # mixed case for fold coverage
    vocab = np.array(_VOCAB, dtype=object)
    toks = vocab[token_ids]
    toks[upper_mask] = [t.capitalize() for t in toks[upper_mask]]

    offsets = np.concatenate([[0], np.cumsum(lens)])
    skew_mask = rng.random(n) < 0.9 if skew else np.zeros(n, dtype=bool)

    stop_vocab = None
    rng_stop = None
    if stopword_frac > 0.0:
        from .textprep import STOPWORDS

        stop_vocab = np.array(sorted(STOPWORDS), dtype=object)
        rng_stop = np.random.default_rng(seed + 0x5709)

    texts, urls, langs = [], [], []
    lang_choices = rng.choice(["en"] * 9 + ["hi", "de", "zz"], size=n)
    for i in range(n):
        doc_toks = list(toks[offsets[i] : offsets[i + 1]])
        doc_toks.append(f"salt{i:07d}")  # unique per-doc term
        if skew_mask[i]:
            doc_toks.insert(int(lens[i]) // 2, SKEW_TERM)
        if stop_vocab is not None:
            # k stop tokens so k / (len + k) ≈ stopword_frac, spliced at
            # deterministic positions (content tokens keep their order)
            k = int(len(doc_toks) * stopword_frac / (1.0 - stopword_frac))
            if k:
                ins = rng_stop.integers(0, len(doc_toks) + 1, size=k)
                stops = stop_vocab[rng_stop.integers(0, len(stop_vocab), k)]
                for pos, s in sorted(
                    zip(ins.tolist(), stops.tolist()), reverse=True
                ):
                    doc_toks.insert(pos, s)
        texts.append(" ".join(doc_toks))
        urls.append(f"https://site{i % 97}.example/{_slug(i)}")
        langs.append(str(lang_choices[i]))

    ts = pd.Timestamp("2020-01-01", tz="UTC") + pd.to_timedelta(
        np.arange(n) * 137, unit="s"
    )
    htmls = [render_html(texts[i], i, i % 97) for i in range(n)]
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts.tz_localize(None),
            "html": htmls,
            "text": texts,
            "lang": langs,
        }
    )


def write_pandas_pages(pdf: pd.DataFrame, path: str) -> str:
    """Write a pages-shaped pandas frame as Spark-readable parquet
    (timestamps down-cast to microseconds — Spark rejects NANOS).

    Row groups are capped at 10k rows: Spark can only split a parquet file
    at row-group boundaries, so a single-row-group file would pin the whole
    scan (and everything narrow after it) to ONE task regardless of cores.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(pdf, schema=schema, preserve_index=False)
    pq.write_table(table, path, row_group_size=10_000)
    return path


def write_pages_parquet(
    path: str,
    n: int,
    seed: int = 42,
    skew: bool = False,
    stopword_frac: float = 0.0,
) -> str:
    """Write a pages parquet the engine can `spark.read.parquet`."""
    return write_pandas_pages(
        gen_pages(n, seed=seed, skew=skew, stopword_frac=stopword_frac), path
    )
