"""Document parse + dynamic mapping tests (sources/doc_parse.py)."""

from __future__ import annotations

import pytest

from elasticsearch_spark.sources import doc_parse


@pytest.fixture(scope="module")
def raw(spark):
    rows = [
        (1, '{"title": "hello", "views": 10, "nested_tags": [{"t": "a"}], "extra": "x"}'),
        (2, '{"title": "world", "views": 20, "nested_tags": []}'),
    ]
    return spark.createDataFrame(rows, "id long, body string")


MAPPING = {
    "properties": {
        "title": {"type": "text"},
        "views": {"type": "long"},
        "nested_tags": {"type": "nested", "properties": {"t": {"type": "keyword"}}},
    }
}


def test_mapping_to_schema(spark):
    schema = doc_parse.mapping_to_schema(MAPPING)
    assert schema["views"].dataType.typeName() == "long"
    assert schema["nested_tags"].dataType.typeName() == "array"


def test_dynamic_true_infers_extra(spark, raw):
    parsed, rejects = doc_parse.parse_documents(spark, raw, "body", MAPPING, dynamic="true", id_col="id")
    assert rejects.count() == 0
    rows = {r["id"]: r for r in parsed.collect()}
    assert rows[1]["views"] == 10 and rows[1]["extra"] == "x"
    assert rows[2]["extra"] is None
    assert "_source" in parsed.columns


def test_dynamic_false_drops_unmapped(spark, raw):
    parsed, _ = doc_parse.parse_documents(spark, raw, "body", MAPPING, dynamic="false", id_col="id")
    assert "extra" not in parsed.columns
    # still retrievable from _source (stored, not indexed)
    assert '"extra"' in parsed.where("id = 1").collect()[0]["_source"]


def test_dynamic_strict_rejects(spark, raw):
    parsed, rejects = doc_parse.parse_documents(spark, raw, "body", MAPPING, dynamic="strict", id_col="id")
    assert [r["id"] for r in parsed.collect()] == [2]
    rej = rejects.collect()
    assert len(rej) == 1 and "extra" in rej[0]["_reason"]


def test_runtime_field(spark, raw):
    parsed, _ = doc_parse.parse_documents(spark, raw, "body", MAPPING, dynamic="false", id_col="id")
    out = doc_parse.runtime_field(parsed, "views_sq", "views * views")
    assert {r["views_sq"] for r in out.collect()} == {100, 400}


def test_strict_malformed_json_quarantined(spark):
    """Invalid / non-object JSON under dynamic=strict lands in rejects
    with a reason — it must not vanish from both frames."""
    from elasticsearch_spark.sources.doc_parse import parse_documents

    raw = spark.createDataFrame(
        [('{"name":"ok","n":1}',), ("{not json",), ('[1,2]',), (None,)],
        "js string")
    parsed, rejects = parse_documents(
        spark, raw, "js", {"properties": {"name": {"type": "keyword"},
                                          "n": {"type": "long"}}},
        dynamic="strict")
    assert parsed.count() == 1
    rej = rejects.collect()
    assert len(rej) == 3
    assert all("mapper_parsing_exception" in r["_reason"] for r in rej)
