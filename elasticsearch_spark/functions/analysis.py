"""Analysis chain: char filters → tokenizer → token filters.

Re-implements the reference's default ``standard`` analyzer
(StandardTokenizer = UAX#29 word break, + lowercase, + empty stopword set,
max_token_length=255; registered at
``server/src/main/java/org/elasticsearch/indices/analysis/AnalysisModule.java:253-254``,
built in ``server/.../index/analysis/StandardAnalyzerProvider.java:21-27``)
and the ``html_strip`` char filter
(``modules/analysis-common/.../HtmlStripCharFilterFactory.java:24-40``)
as vectorized pandas/Arrow UDFs — no per-row Python UDFs are registered
with Spark; all batch work is Arrow-transferred and regex/C-speed inside.

UAX#29 coverage (documented approximation):
- alphanumeric runs; letters and digits join directly (WB8/9/10);
- MidLetter/MidNumLet (' ’ . · :) join letter runs (WB6/7), MidNum/MidNumLet
  (, . ') join digit runs (WB11/12) — so ``don't``, ``3.14``, ``1,000``,
  ``example.com``, ``foo:bar`` are single tokens, matching Lucene;
- ExtendNumLet ``_`` glues clusters (WB13a/b): ``foo_bar`` is one token;
- combining marks (Mn/Mc/Me — UAX#29 Extend, WB4) join the preceding
  letter/digit, so Devanagari/Hebrew/Arabic/Tamil words with matras,
  niqqud, harakat, or viramas tokenize whole;
- Han + Hiragana emit one token per ideograph, Katakana/Hangul as runs
  (matching StandardTokenizer's IDEOGRAPHIC/HIRAGANA/KATAKANA/HANGUL types);
- tokens longer than 255 chars are split at the 255 boundary.
Remaining divergences from ICU-exact UAX#29 (regional indicators,
Turkish dotted-I lowercasing, WB7a-c Hebrew single-quote rules) are
documented; conformance is pinned by a SPEC-DERIVED adversarial golden
set (tests/goldens/uax29_spec_goldens.json — expected tokens hand-derived
from the UAX#29 rules, NOT from this implementation).

The ``regex_simple`` analyzer (``[a-z0-9]+`` over lowercased text) exists so
query results can be mirrored exactly in ANSI SQL
(``regexp_extract_all(lower(text), '[a-z0-9]+')`` in DuckDB) for the
correctness oracle.
"""

from __future__ import annotations

import html as _htmlmod
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType, StructField, StructType

MAX_TOKEN_LENGTH = 255

# --- character classes -------------------------------------------------------
_HAN = (
    "⺀-⻿々〇〡-〩〸-〻"
    "㐀-䶿一-鿿豈-﫿"
)
_HIRA = "ぁ-ゖゝ-ゟ"
_KATA = "ァ-ヺー-ヿㇰ-ㇿｦ-ﾝ"
_HANGUL = "가-힣ᄀ-ᇿ㄰-㆏"
_CJK = _HAN + _HIRA + _KATA + _HANGUL

def _mark_char_class() -> str:
    """Regex character-class ranges for Unicode marks (categories Mn/Mc/Me
    — UAX#29 'Extend'). Python ``re`` has no ``\\p{M}``, so the class is
    generated once from unicodedata (the same data the JVM's \\p{M}
    reads). WB4: Extend characters never break a word — a combining mark
    glues to whatever precedes it, so Devanagari/Hebrew/Tamil words with
    matras, niqqud, or viramas stay ONE token (they used to split at
    every mark)."""
    import unicodedata

    ranges: list[tuple[int, int]] = []
    start = prev = None
    for cp in range(0x0300, 0xE0200):  # marks live in [U+0300, U+E01EF]
        if unicodedata.category(chr(cp)).startswith("M"):
            if prev is not None and cp == prev + 1:
                prev = cp
            else:
                if start is not None:
                    ranges.append((start, prev))
                start = prev = cp
    if start is not None:
        ranges.append((start, prev))
    return "".join(
        re.escape(chr(a)) if a == b else f"{re.escape(chr(a))}-{re.escape(chr(b))}"
        for a, b in ranges
    )


_M = f"[{_mark_char_class()}]"

# letters excluding CJK classes handled separately; digits = Unicode Nd.
# Each letter/digit may carry combining marks (WB4 Extend — see above).
_L = rf"(?:(?![{_CJK}])[^\W\d_]){_M}*"
_D = rf"\d{_M}*"
_ML = "['’‘.··‧:״]"
_MN = "[,.'’․]"

_LPART = rf"(?:{_L})+(?:{_ML}(?:{_L})+)*"
_NPART = rf"(?:{_D})+(?:{_MN}(?:{_D})+)*"
_WORD = rf"_*(?:{_LPART}|{_NPART})(?:_*(?:{_LPART}|{_NPART}))*_*"

TOKEN_RE = re.compile(rf"(?:{_WORD})|[{_HAN}]{_M}*|[{_HIRA}]{_M}*|(?:[{_KATA}]{_M}*)+|(?:[{_HANGUL}]{_M}*)+")

# fast path: the mark-aware pattern costs ~2x on mark-free text (the
# overwhelming case — NFC web text precomposes Latin diacritics), and both
# patterns are provably identical when no mark codepoint is present, so a
# single C-speed containment scan picks the cheap one
_L0 = rf"(?:(?![{_CJK}])[^\W\d_])"
_LPART0 = rf"{_L0}+(?:{_ML}{_L0}+)*"
_NPART0 = rf"\d+(?:{_MN}\d+)*"
_WORD0 = rf"_*(?:{_LPART0}|{_NPART0})(?:_*(?:{_LPART0}|{_NPART0}))*_*"
TOKEN_RE_NOMARK = re.compile(rf"(?:{_WORD0})|[{_HAN}]|[{_HIRA}]|[{_KATA}]+|[{_HANGUL}]+")
_HAS_MARK = re.compile(_M)

# --- html_strip char filter ---------------------------------------------------
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|table|tr|td|th|blockquote|pre|hr|"
    "section|article|header|footer|nav|aside|form|figure|figcaption|dl|dt|dd|title"
)
_RE_SCRIPT = re.compile(r"(?is)<(script|style)\b.*?(?:</\1\s*>|$)")
_RE_COMMENT = re.compile(r"(?s)<!--.*?(?:-->|$)")
_RE_BLOCK = re.compile(rf"(?is)</?(?:{_BLOCK_TAGS})\b[^<>]*/?\s*>")
_RE_TAG = re.compile(r"(?s)<[/!?]?[a-zA-Z][^<>]*>")


def html_strip(raw: bytes | str | None) -> str:
    """html → text, the ``html_strip`` char filter.

    Deterministic approximation of Lucene's HTMLStripCharFilter: drops
    script/style/comments, turns block-level tags into newlines, removes
    inline tags, decodes entities, and tolerates broken markup. This function
    IS the byte-identity invariant: the pages generator stores
    ``text = html_strip(html)`` and tests assert the UDF output equals the
    stored column byte-for-byte per url.
    """
    if raw is None:
        return ""
    s = raw.decode("utf-8", errors="replace") if isinstance(raw, (bytes, bytearray)) else raw
    s = _RE_SCRIPT.sub("", s)
    s = _RE_COMMENT.sub("", s)
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub("", s)
    s = _htmlmod.unescape(s)
    return s


def _split_long(tok: str) -> Iterator[str]:
    if len(tok) <= MAX_TOKEN_LENGTH:
        yield tok
    else:
        for i in range(0, len(tok), MAX_TOKEN_LENGTH):
            yield tok[i : i + MAX_TOKEN_LENGTH]


def standard_tokenize(text: str) -> list[str]:
    """text → lowercased token list (standard analyzer). Lowercases the
    whole string first, then tokenizes in one C-level ``findall`` pass —
    equivalent to per-token lowercase for every case-insensitive-stable
    codepoint (the rare multi-char lowercase expansions, e.g. İ, are
    accepted divergences pinned by the golden tests)."""
    if not text:
        return []
    low = text.lower()
    # isascii() is a free C check that skips the (comparatively slow)
    # mark-class scan for the dominant ASCII case
    if low.isascii() or not _HAS_MARK.search(low):
        toks = TOKEN_RE_NOMARK.findall(low)
    else:
        toks = TOKEN_RE.findall(low)
    for t in toks:
        if len(t) > MAX_TOKEN_LENGTH:
            out: list[str] = []
            for tok in toks:
                out.extend(_split_long(tok))
            return out
    return toks


_SIMPLE_RE = re.compile(r"[a-z0-9]+")


def regex_simple_tokenize(text: str) -> list[str]:
    """SQL-mirrorable analyzer: lowercase then ``[a-z0-9]+`` runs."""
    if not text:
        return []
    return _SIMPLE_RE.findall(text.lower())


def english_analyze(text: str) -> list[str]:
    """The `english` language analyzer preset (AC/CommonAnalysisPlugin
    registers per-language analyzers; english = standard tokenizer +
    lowercase + english stop set + english stemmer — the most-used of the
    ~40 language presets)."""
    toks = standard_tokenize(text)
    toks = _filter_stop(toks)
    return _filter_stemmer_minimal_english(toks)


ANALYZERS = {
    "standard": standard_tokenize,
    "regex_simple": regex_simple_tokenize,
    "english": english_analyze,
}

# --- token filters (the AC/ factory layer, applied tokenizer-output-side) ---

# Lucene's _english_ stop set (StopAnalyzer/EnglishAnalyzer default; wired
# through S/index/analysis/StopTokenFilterFactory.java:22)
ENGLISH_STOP = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def _filter_stop(toks: list[str], stopwords=ENGLISH_STOP, **_) -> list[str]:
    return [t for t in toks if t not in stopwords]


def _filter_asciifolding(toks: list[str], **_) -> list[str]:
    import unicodedata

    return [
        unicodedata.normalize("NFKD", t).encode("ascii", "ignore").decode("ascii") or t
        for t in toks
    ]


def _filter_shingle(toks: list[str], min_size=2, max_size=2, output_unigrams=True, **_) -> list[str]:
    out = list(toks) if output_unigrams else []
    for size in range(min_size, max_size + 1):
        out.extend(" ".join(toks[i : i + size]) for i in range(len(toks) - size + 1))
    return out


def _filter_ngram(toks: list[str], min_gram=1, max_gram=2, **_) -> list[str]:
    out = []
    for t in toks:
        for n in range(min_gram, max_gram + 1):
            out.extend(t[i : i + n] for i in range(len(t) - n + 1))
    return out


def _filter_edge_ngram(toks: list[str], min_gram=1, max_gram=10, **_) -> list[str]:
    out = []
    for t in toks:
        out.extend(t[:n] for n in range(min_gram, min(max_gram, len(t)) + 1))
    return out


def _filter_stemmer_minimal_english(toks: list[str], **_) -> list[str]:
    """Minimal english s-stemmer (the reference's `minimal_english` stemmer
    option, kstem/porter are heavier variants of the same hook)."""
    out = []
    for t in toks:
        if len(t) > 3 and t.endswith("s") and not t.endswith(("ss", "us", "is")):
            if t.endswith("ies") and len(t) > 4:
                out.append(t[:-3] + "y")
            elif t.endswith("es") and t[-3] in "sxz":
                out.append(t[:-2])
            else:
                out.append(t[:-1])
        else:
            out.append(t)
    return out


def _filter_length(toks: list[str], min=1, max=255, **_) -> list[str]:  # noqa: A002
    return [t for t in toks if min <= len(t) <= max]


def _filter_unique(toks: list[str], **_) -> list[str]:
    return list(dict.fromkeys(toks))


def _filter_truncate(toks: list[str], length=10, **_) -> list[str]:
    return [t[:length] for t in toks]


def _filter_reverse(toks: list[str], **_) -> list[str]:
    return [t[::-1] for t in toks]


def _filter_synonym(toks: list[str], synonyms: dict | list | None = None, expand: bool = True, **_) -> list[str]:
    """synonym filter (AC/SynonymTokenFilterFactory.java, graph-lite):
    `synonyms` as {"term": ["syn1", ...]} or Solr-style ["a, b => c", "x, y"].
    expand=True emits the original token plus its synonyms at the same
    position (flattened — no position graph, matching how our postings
    treat multi-token positions today)."""
    table: dict[str, list[str]] = {}
    if isinstance(synonyms, dict):
        table = {k: list(v) for k, v in synonyms.items()}
    else:
        for rule in synonyms or []:
            if "=>" in rule:
                lhs, rhs = rule.split("=>")
                tgts = [t.strip() for t in rhs.split(",") if t.strip()]
                for src in (t.strip() for t in lhs.split(",")):
                    if src:
                        table[src] = tgts
            else:
                group = [t.strip() for t in rule.split(",") if t.strip()]
                for src in group:
                    table[src] = [t for t in group if t != src]
    out: list[str] = []
    for t in toks:
        if t in table:
            if expand:
                out.append(t)
            out.extend(table[t])
        else:
            out.append(t)
    return out


def _filter_lowercase(toks: list[str], **_) -> list[str]:
    return [t.lower() for t in toks]


def _filter_uppercase(toks: list[str], **_) -> list[str]:
    return [t.upper() for t in toks]


def _filter_trim(toks: list[str], **_) -> list[str]:
    return [t.strip() for t in toks]


def _filter_apostrophe(toks: list[str], **_) -> list[str]:
    """apostrophe filter (AC/ApostropheFilterFactory.java): strip the
    apostrophe and everything after it (Turkish possessives)."""
    out = []
    for t in toks:
        for ch in ("'", "’"):
            i = t.find(ch)
            if i >= 0:
                t = t[:i]
                break
        if t:
            out.append(t)
    return out


def _filter_decimal_digit(toks: list[str], **_) -> list[str]:
    """decimal_digit (AC/DecimalDigitFilterFactory.java): fold Unicode
    decimal digits (Arabic-Indic, Devanagari, …) to ASCII 0-9."""
    import unicodedata

    def fold(t: str) -> str:
        return "".join(
            str(unicodedata.decimal(c)) if unicodedata.category(c) == "Nd" else c
            for c in t
        )

    return [fold(t) for t in toks]


_WD_SPLIT = re.compile(r"[^0-9A-Za-z]+")
_WD_CASE = re.compile(r"(?<=[a-z])(?=[A-Z])|(?<=[A-Za-z])(?=[0-9])|(?<=[0-9])(?=[A-Za-z])")


def _filter_word_delimiter(
    toks: list[str],
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    catenate_all: bool = False,
    preserve_original: bool = False,
    **_,
) -> list[str]:
    """word_delimiter (AC/WordDelimiterTokenFilterFactory.java, graph-lite):
    split on intra-word punctuation and case/letter-digit transitions
    ('PowerShot-500' → power, shot, 500); catenate_all adds the joined run,
    preserve_original keeps the input token."""
    out: list[str] = []
    for t in toks:
        parts: list[str] = []
        for chunk in _WD_SPLIT.split(t):
            if chunk:
                parts.extend(p for p in _WD_CASE.split(chunk) if p)
        emitted = [
            p.lower() for p in parts
            if (p.isdigit() and generate_number_parts) or (not p.isdigit() and generate_word_parts)
        ]
        if preserve_original and (len(parts) > 1 or (parts and parts[0] != t)):
            out.append(t.lower())
        out.extend(emitted)
        if catenate_all and len(parts) > 1:
            out.append("".join(parts).lower())
    return out


def _filter_keyword_repeat_stem(toks: list[str], **_) -> list[str]:
    """keyword_repeat + stemmer composition: emit the original and the
    stemmed form when they differ (the common exact+stemmed recall trick)."""
    out = []
    for t in toks:
        s = _filter_stemmer_minimal_english([t])[0]
        out.append(t)
        if s != t:
            out.append(s)
    return out


TOKEN_FILTERS = {
    "synonym": _filter_synonym,
    "stop": _filter_stop,
    "asciifolding": _filter_asciifolding,
    "shingle": _filter_shingle,
    "ngram": _filter_ngram,
    "edge_ngram": _filter_edge_ngram,
    "stemmer": _filter_stemmer_minimal_english,
    "length": _filter_length,
    "unique": _filter_unique,
    "truncate": _filter_truncate,
    "reverse": _filter_reverse,
    "lowercase": _filter_lowercase,
    "uppercase": _filter_uppercase,
    "trim": _filter_trim,
    "apostrophe": _filter_apostrophe,
    "decimal_digit": _filter_decimal_digit,
    "word_delimiter": _filter_word_delimiter,
    "word_delimiter_graph": _filter_word_delimiter,
    "keyword_repeat_stem": _filter_keyword_repeat_stem,
}


# configs of registered custom analyzers — shipped to executors so a chain
# registered on the driver can be re-materialized inside a task (executors
# import this module fresh from the --py-files zip)
ANALYZER_CONFIGS: dict[str, tuple[str, list]] = {}


def register_analyzer(name: str, tokenizer: str = "standard", filters: list | None = None) -> None:
    """Register a custom analyzer chain (the CustomAnalyzer /
    AnalysisRegistry model, ``S/index/analysis/AnalysisRegistry.java:646``):
    tokenizer name + ordered token-filter list; each filter is a name or
    (name, params) pair."""
    ANALYZER_CONFIGS[name] = (tokenizer, list(filters or []))
    base = ANALYZERS[tokenizer]
    specs = []
    for fspec in filters or []:
        if isinstance(fspec, str):
            specs.append((TOKEN_FILTERS[fspec], {}))
        else:
            fname, params = fspec
            specs.append((TOKEN_FILTERS[fname], params))

    def fn(text: str) -> list[str]:
        toks = base(text)
        for ff, params in specs:
            toks = ff(toks, **params)
        return toks

    ANALYZERS[name] = fn


def analyze(text: str, analyzer: str = "standard") -> list[str]:
    return ANALYZERS[analyzer](text)


def analyze_detail(text: str, analyzer: str = "standard") -> list[dict]:
    """``_analyze``-shaped introspection: per-token
    {token, start_offset, end_offset, position}, mirroring
    ``TransportAnalyzeAction.simpleAnalyze``
    (``server/.../analyze/TransportAnalyzeAction.java:236-240``)."""
    if analyzer == "regex_simple":
        toks = []
        low = (text or "").lower()
        for pos, m in enumerate(_SIMPLE_RE.finditer(low)):
            toks.append(
                {"token": m.group(0), "start_offset": m.start(), "end_offset": m.end(), "position": pos}
            )
        return toks
    toks = []
    pos = 0
    for m in TOKEN_RE.finditer(text or ""):
        off = m.start()
        for t in _split_long(m.group(0)):
            toks.append(
                {
                    "token": t.lower(),
                    "start_offset": off,
                    "end_offset": off + len(t),
                    "position": pos,
                }
            )
            off += len(t)
            pos += 1
    return toks


# --- Spark UDF surface (Arrow-batched) ---------------------------------------

def _tokenize_series(s: pd.Series, analyzer: str) -> pd.Series:
    fn = ANALYZERS[analyzer]
    return s.map(lambda x: fn(x) if x is not None else [])


def tokens_udf(analyzer: str = "standard"):
    """pandas UDF: string column → array<string> of analyzed tokens."""

    @F.pandas_udf(ArrayType(StringType()))
    def _udf(s: pd.Series) -> pd.Series:
        return _tokenize_series(s, analyzer)

    return _udf


@F.pandas_udf(StringType())
def html_strip_udf(s: pd.Series) -> pd.Series:
    """pandas UDF: html (binary or string) column → extracted text."""
    return s.map(html_strip)


ANALYZE_DETAIL_SCHEMA = ArrayType(
    StructType(
        [
            StructField("token", StringType()),
            StructField("start_offset", IntegerType()),
            StructField("end_offset", IntegerType()),
            StructField("position", IntegerType()),
        ]
    )
)


def analyze_detail_udf(analyzer: str = "standard"):
    @F.pandas_udf(ANALYZE_DETAIL_SCHEMA)
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: [
                (d["token"], d["start_offset"], d["end_offset"], d["position"])
                for d in analyze_detail(x, analyzer)
            ]
            if x is not None
            else []
        )

    return _udf
