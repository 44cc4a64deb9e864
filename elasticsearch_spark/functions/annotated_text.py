"""annotated_text field mapper (plugins/mapper-annotated-text,
``AnnotatedTextFieldMapper.java``): markdown-style inline annotations —
``[Paris](City&geo:FR)`` — where the wrapped text is analyzed normally and
each annotation VALUE is injected as a search token at the position of the
first token of the annotated span (the reference's ``AnnotationsInjector``
emits it with positionIncrement 0; multi-value annotations split on ``&``
and URL-decode).

Our postings model keeps positions implicit (token array index), so the
injected tokens live in a companion column instead of the token stream:
``parse_annotated`` yields ``(text, ann: array<struct<value, pos>>)`` where
``pos`` indexes into the SAME analyzed-token position space as the plain
text. Same observable semantics, two columns:

- term/match on an annotation value → ``annotated_term`` (JVM ``exists``
  over the ann array, no Python in the query path);
- phrases mixing words and annotations → ``annotated_phrase`` (per-element
  position arrays, shifted and intersected — all JVM higher-order
  functions). Like the reference, an annotation over a multi-token span
  occupies the span's FIRST position with length 1 (Lucene phrase queries
  ignore positionLength — quirk parity, documented).

Parsing runs once at ingest in an Arrow-batched pandas UDF; queries are
pure Column expressions over the parsed columns.
"""

from __future__ import annotations

import re
from urllib.parse import unquote

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .analysis import ANALYZER_CONFIGS, ANALYZERS, register_analyzer

# [wrapped text](value) — value may not contain ')' or whitespace (the
# reference rejects annotations with embedded markup the same way)
_ANN_RE = re.compile(r"\[([^\]]*)\]\(([^)\s]*)\)")

ANNOTATED_SCHEMA = StructType(
    [
        StructField("text", StringType()),
        StructField(
            "ann",
            ArrayType(
                StructType(
                    [
                        StructField("value", StringType()),
                        StructField("pos", IntegerType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_annotated(raw: str, analyzer: str = "standard") -> tuple[str, list[tuple[str, int]]]:
    """One value → (plain text, [(annotation value, token position)]).

    The position of an annotation = the number of analyzer tokens in the
    plain text BEFORE the annotated span — i.e. the position its span's
    first token will occupy in the analyzed stream."""
    fn = ANALYZERS[analyzer]
    out: list[tuple[str, int]] = []
    plain_parts: list[str] = []
    last = 0
    plain_len = 0
    for m in _ANN_RE.finditer(raw or ""):
        plain_parts.append(raw[last : m.start()])
        plain_len += len(raw[last : m.start()])
        prefix = "".join(plain_parts)
        pos = len(fn(prefix))
        for v in m.group(2).split("&"):
            if v:
                out.append((unquote(v), pos))
        plain_parts.append(m.group(1))
        last = m.end()
    plain_parts.append((raw or "")[last:])
    return "".join(plain_parts), out


def parse_annotated_udf(analyzer: str = "standard"):
    """pandas UDF: raw annotated string → struct(text, ann). The analyzer
    function is captured in the closure (same shipping model as
    ``analysis.tokens_udf`` — executors can't resolve custom names)."""
    cfg = ANALYZER_CONFIGS.get(analyzer)

    @F.pandas_udf(ANNOTATED_SCHEMA)
    def _udf(s: pd.Series) -> pd.DataFrame:
        if analyzer not in ANALYZERS and cfg is not None:
            register_analyzer(analyzer, *cfg)
        texts, anns = [], []
        for x in s:
            t, a = parse_annotated(x or "", analyzer)
            texts.append(t)
            anns.append(a)
        return pd.DataFrame({"text": texts, "ann": anns})

    return _udf


def annotated_term(ann_col, value: str):
    """Predicate: document carries annotation ``value`` anywhere."""
    return F.exists(ann_col, lambda a: a["value"] == F.lit(value))


def _positions(tokens_col, ann_col, elem: dict):
    """Position array for one phrase element ({'term': w} | {'annotation': v})."""
    if "term" in elem:
        w = elem["term"]
        return F.filter(
            F.transform(
                tokens_col, lambda t, i: F.when(t == F.lit(w), i).otherwise(F.lit(-1))
            ),
            lambda x: x >= 0,
        )
    v = elem["annotation"]
    return F.transform(
        F.filter(ann_col, lambda a: a["value"] == F.lit(v)), lambda a: a["pos"]
    )


def annotated_phrase(tokens_col, ann_col, seq: list[dict]):
    """Predicate: the element sequence occurs at consecutive positions.

    Element k's positions are shifted by -k and the arrays intersected —
    a non-empty intersection is a phrase start. Pure JVM higher-order
    functions; cost is O(len(tokens) · len(seq)) per row with no shuffle."""
    if not seq:
        raise ValueError("empty annotated phrase")
    acc = _positions(tokens_col, ann_col, seq[0])
    for k, elem in enumerate(seq[1:], start=1):
        shifted = F.transform(
            _positions(tokens_col, ann_col, elem), lambda p: p - F.lit(k)
        )
        acc = F.array_intersect(acc, shifted)
    return F.size(acc) > 0
