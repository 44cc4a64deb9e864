"""Boilerplate removal for crawled HTML (the jusText/readability-class
heuristic every web-text pipeline runs between html_strip and quality
filtering): navigation, footers, link farms, and cookie banners are
identified by BLOCK-LEVEL LINK DENSITY and dropped; body prose survives.

Heuristic (the published jusText/Arc90 core, deterministic):
1. split the page into blocks at block-level tag boundaries
   (p/div/section/li/td/h1-6/...);
2. blocks inside <nav>/<footer>/<aside>/<header> elements are boilerplate
   by position;
3. for the rest: visible text length and link density
   (chars inside <a> / total chars) decide — short blocks and blocks that
   are mostly links are boilerplate.

Runs as one Arrow-batched pandas UDF over the raw HTML column (regex
only — no parser dependency), embarrassingly parallel, no shuffle.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

_BLOCK_SPLIT = re.compile(
    r"(?i)</?(?:p|div|section|article|li|ul|ol|td|tr|table|h[1-6]|br|blockquote|pre)\b[^>]*>"
)
_POSITIONAL = re.compile(
    r"(?is)<(nav|footer|aside|header)\b[^>]*>.*?</\1>"
)
_SCRIPT_STYLE = re.compile(r"(?is)<(script|style|noscript)\b[^>]*>.*?</\1>")
_A_TEXT = re.compile(r"(?is)<a\b[^>]*>(.*?)</a>")
_TAG = re.compile(r"(?s)<[^>]+>")
_WS = re.compile(r"\s+")


def strip_boilerplate_text(
    html: str,
    min_block_chars: int = 25,
    max_link_density: float = 0.33,
) -> str:
    """One page → extracted main text (kept blocks joined by newlines)."""
    if not html:
        return ""
    page = _SCRIPT_STYLE.sub(" ", html)
    page = _POSITIONAL.sub(" ", page)  # nav/footer/aside/header: positional drop
    kept: list[str] = []
    for block in _BLOCK_SPLIT.split(page):
        link_chars = sum(
            len(_WS.sub(" ", _TAG.sub("", m)).strip()) for m in _A_TEXT.findall(block)
        )
        text = _WS.sub(" ", _TAG.sub(" ", block)).strip()
        if len(text) < min_block_chars:
            continue
        if link_chars / max(len(text), 1) > max_link_density:
            continue
        kept.append(text)
    return "\n".join(kept)


def strip_boilerplate_udf(min_block_chars: int = 25, max_link_density: float = 0.33):
    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        return s.map(
            lambda h: strip_boilerplate_text(
                h or "", min_block_chars=min_block_chars,
                max_link_density=max_link_density,
            )
        )

    return _udf
