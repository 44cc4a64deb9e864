"""attachment ingest processor (plugins/ingest-attachment): content-type
sniffing, HTML/plain-text extraction + language ID (real), binary formats
recognized but engine-gated (content null, documented)."""

from __future__ import annotations

import base64

import pytest

from elasticsearch_spark.sources.ingest_pipeline import run_pipeline


def _b64(b: bytes) -> str:
    return base64.b64encode(b).decode()


@pytest.fixture(scope="module")
def out(spark):
    rows = [
        ("plain", _b64(b"the quick brown fox and the lazy dog went home")),
        ("html", _b64(b"<html><body><p>Hello <b>World</b> page</p></body></html>")),
        ("pdf", _b64(b"%PDF-1.4 binarystuff")),
        ("zip", _b64(b"PK\x03\x04zipstuff")),
        ("rtf", _b64(b"{\\rtf1 doc")),
        ("de", _b64("der hund und die katze sind und der das und".encode())),
    ]
    df = spark.createDataFrame(rows, "id string, data string")
    res = run_pipeline(df, [{"attachment": {"field": "data"}}])
    return {r["id"]: r["attachment"] for r in res.collect()}


def test_content_types(out):
    assert out["plain"]["content_type"] == "text/plain"
    assert out["html"]["content_type"] == "text/html"
    assert out["pdf"]["content_type"] == "application/pdf"
    assert out["zip"]["content_type"] == "application/zip"
    assert out["rtf"]["content_type"] == "application/rtf"


def test_text_extraction_and_language(out):
    assert "quick brown fox" in out["plain"]["content"]
    assert out["plain"]["language"] == "en"
    assert out["de"]["language"] == "de"
    assert "Hello World page" in out["html"]["content"].replace("\n", " ")
    assert "<b>" not in out["html"]["content"]


def test_binary_formats_gated(out):
    # recognized but not extracted (no Tika in this environment)
    for k in ("pdf", "zip", "rtf"):
        assert out[k]["content"] is None
        assert out[k]["content_length"] is None


def test_properties_filter_and_indexed_chars(spark):
    df = spark.createDataFrame([("x", _b64(b"hello world"))], "id string, data string")
    res = run_pipeline(
        df,
        [{"attachment": {"field": "data", "properties": ["content", "content_type"],
                         "indexed_chars": 5, "target_field": "att"}}],
    ).collect()[0]["att"]
    assert res.asDict().keys() == {"content", "content_type"}
    assert res["content"] == "hello"


def test_binary_input_column(spark):
    df = spark.createDataFrame([("x", bytearray(b"plain text here"))], "id string, data binary")
    res = run_pipeline(df, [{"attachment": {"field": "data"}}]).collect()[0]["attachment"]
    assert res["content"] == "plain text here"
    assert res["content_type"] == "text/plain"
