"""Deterministic Common-Crawl-style ``pages`` generator (FIXTURES.md T1/T2).

Shape fixed by BASELINE.json input_hint:
    pages(url string, warc_ts timestamp, html binary, text string, lang string)

Deterministic per row-id k regardless of partitioning (counter-based Philox
PRNG keyed (SEED, k)), so the same table materializes identically at any
parallelism — required for the two-cluster-size scaling evidence and the
resume tests. Generation is distributed (spark.range → mapInPandas): at
bench scale nothing funnels through the driver.

Properties engineered per FIXTURES.md:
- Zipf(s=1.07) token draws over a 50k vocab → realistic df skew; the top
  ~20 ranks are stopword-scale hot terms (the salting test case).
- doc length ~ lognormal(μ=5.3, σ=0.8), clipped [5, 2000].
- 1% duplicate urls with later warc_ts (latest-by-key dedup semantics of
  the reference engine op, ``server/.../index/engine/InternalEngine.java:1373``).
- 5% of docs embed UAX#29 edge-case tokens (mixed case, accents, CJK,
  >255-char token, numerals, apostrophes).
- ``text`` is html_strip(html) BY CONSTRUCTION — the byte-identity invariant.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

from ..functions.analysis import html_strip

SEED = 42
VOCAB_SIZE = 50_000
ZIPF_S = 1.07

_STOPWORDS = [
    "the", "of", "and", "to", "a", "in", "is", "it", "you", "that",
    "he", "was", "for", "on", "are", "as", "with", "his", "they", "i",
]

_SPECIAL_TOKENS = [
    "Zürich", "café", "naïve", "don't", "O'Brien", "例子", "中文", "する",
    "3.14159", "1,000,000", "MixedCase", "UPPERCASE", "foo_bar", "x" * 300,
]


def _vocab() -> list[str]:
    words = list(_STOPWORDS)
    for i in range(VOCAB_SIZE - len(_STOPWORDS)):
        words.append(f"w{i:05d}")
    return words


_VOCAB = _vocab()

_zw = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
_ZIPF_CUM = np.cumsum(_zw / _zw.sum())

_HTML_TEMPLATE = (
    "<html><head><title>{title}</title><script>var x=1;</script></head>"
    "<body><h1>{title}</h1>\n<!-- comment -->"
    "<p>{body}</p>&amp; entities &lt;kept&gt;, <b>nested <i>tags</i></b>, malformed <br>"
    "</body></html>"
)


def _row(k: int) -> tuple[str, int, bytes, str, str]:
    """Generate row k. Returns (url, warc_ts_epoch_us, html, text, lang)."""
    rng = np.random.Generator(np.random.Philox(key=[SEED, k]))
    h = rng.integers(0, 100)
    lang = "en" if h < 80 else "de" if h < 90 else "zh" if h < 95 else "unk"
    n_tok = int(np.clip(rng.lognormal(5.3, 0.8), 5, 2000))
    ids = np.searchsorted(_ZIPF_CUM, rng.random(n_tok))
    words = [_VOCAB[i] for i in ids]
    if h % 20 == 7:  # 5%: UAX#29 edge cases
        picks = rng.integers(0, len(_SPECIAL_TOKENS), size=3)
        for p in picks:
            words.insert(int(rng.integers(0, len(words))), _SPECIAL_TOKENS[int(p)])
    body = " ".join(words)
    dup = k % 100 == 99 and k > 0
    src = k - 1 if dup else k
    if dup:
        # the duplicate must reproduce row src's url EXACTLY — building it
        # from row k's own lang made ~35% of intended duplicates distinct
        # urls, silently degrading the documented 1%-duplicates property
        h_src = np.random.Generator(np.random.Philox(key=[SEED, src])).integers(0, 100)
        url_lang = "en" if h_src < 80 else "de" if h_src < 90 else "zh" if h_src < 95 else "unk"
    else:
        url_lang = lang
    url = f"https://site{src % 1000}.example/{url_lang}/page{src:08d}"
    # 2024-01-01T00:00:00Z epoch + k*37s; duplicates land later in time
    ts_us = (1704067200 + k * 37) * 1_000_000
    title = f"Page {k} {lang}"
    page_html = _HTML_TEMPLATE.format(title=title, body=body)
    html_bytes = page_html.encode("utf-8")
    text = html_strip(html_bytes)
    return url, ts_us, html_bytes, text, lang


def pages_pdf(n_rows: int, start: int = 0) -> pd.DataFrame:
    """Local pandas generation (tests, goldens)."""
    rows = [_row(k) for k in range(start, start + n_rows)]
    pdf = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    pdf["warc_ts"] = pd.to_datetime(pdf["warc_ts"], unit="us", utc=True).dt.tz_localize(None)
    return pdf


PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


def pages_df(spark, n_rows: int, n_parts: int | None = None):
    """Distributed generation of the pages table."""
    n_parts = n_parts or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches):
        for pdf in batches:
            ks = pdf["id"].to_numpy()
            rows = [_row(int(k)) for k in ks]
            out = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
            out["warc_ts"] = pd.to_datetime(out["warc_ts"], unit="us", utc=True).dt.tz_localize(None)
            yield out

    return spark.range(0, n_rows, numPartitions=n_parts).mapInPandas(gen, PAGES_SCHEMA)


# --- T2 reference query set ---------------------------------------------------

@dataclass(frozen=True)
class RefQuery:
    qid: str
    kind: str  # disjunctive | conjunctive | filtered | phrase
    terms: tuple[str, ...]
    k: int = 10


def query_set(n: int = 100) -> list[RefQuery]:
    """100 seeded queries: 40 disjunctive / 40 conjunctive / 10 filtered /
    10 phrase, terms drawn at mixed df (incl. hot stopwords to force WAND
    pruning) plus out-of-vocabulary zero-hit terms."""
    rng = np.random.Generator(np.random.Philox(key=[SEED, 10**12]))
    out: list[RefQuery] = []
    kinds = ["disjunctive"] * 40 + ["conjunctive"] * 40 + ["filtered"] * 10 + ["phrase"] * 10
    for i, kind in enumerate(kinds[:n]):
        n_terms = int(rng.integers(2, 6))
        terms: list[str] = []
        for j in range(n_terms):
            band = rng.integers(0, 3)
            if band == 0:
                r = int(rng.integers(0, 50))  # hot
            elif band == 1:
                r = int(rng.integers(50, 2000))  # mid
            else:
                r = int(rng.integers(2000, VOCAB_SIZE))  # tail
            terms.append(_VOCAB[r])
        if i % 17 == 3:
            terms.append(f"zzoov{i:03d}")  # out-of-vocabulary, zero hits
        out.append(RefQuery(qid=f"q{i + 1:03d}", kind=kind, terms=tuple(dict.fromkeys(terms))))
    return out
