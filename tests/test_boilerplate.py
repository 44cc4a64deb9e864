"""Boilerplate removal (jusText/readability link-density heuristic)."""

from __future__ import annotations

import pytest

from elasticsearch_spark.functions.boilerplate import (
    strip_boilerplate_text,
    strip_boilerplate_udf,
)

PAGE = """
<html><head><title>T</title><style>p {color: red}</style>
<script>var x = "the quick brown fox jumped over everything";</script></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact us</a></nav>
<header><h1>Site name</h1></header>
<div class="content">
  <p>This is the first real paragraph of the article with plenty of words in it.</p>
  <p>A second substantial paragraph follows, also long enough to be kept by the filter.</p>
  <p>See <a href="/ref">one reference</a> inside an otherwise long prose paragraph that should survive.</p>
</div>
<div class="related">
  <a href="/a">Related story one</a> <a href="/b">Related story two</a> <a href="/c">Related story three</a>
</div>
<footer>© 2026 Example Corp — <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></footer>
</body></html>
"""


def test_keeps_prose_drops_chrome():
    out = strip_boilerplate_text(PAGE)
    assert "first real paragraph" in out
    assert "second substantial paragraph" in out
    assert "otherwise long prose paragraph" in out  # low link density: kept
    assert "Home" not in out and "Contact us" not in out  # nav
    assert "Example Corp" not in out  # footer
    assert "Related story" not in out  # link farm (high link density)
    assert "Site name" not in out  # header
    assert "quick brown fox" not in out  # script body


def test_short_blocks_dropped():
    assert strip_boilerplate_text("<p>tiny</p><p>%s</p>" % ("long words " * 10)).startswith("long words")
    assert "tiny" not in strip_boilerplate_text("<p>tiny</p>")
    assert strip_boilerplate_text("") == ""


def test_link_density_threshold():
    mostly_links = '<p><a href="/x">click here now please</a> ok</p>'
    assert strip_boilerplate_text(mostly_links) == ""
    # same block with enough surrounding prose passes
    prose = '<p><a href="/x">a link</a> and then a large amount of ordinary prose text follows here</p>'
    assert "ordinary prose" in strip_boilerplate_text(prose)


def test_udf_batch(spark):
    df = spark.createDataFrame([(PAGE,), ("",)], "html string")
    out = df.select(strip_boilerplate_udf()("html").alias("text")).collect()
    assert "first real paragraph" in out[0]["text"]
    assert out[1]["text"] == ""
