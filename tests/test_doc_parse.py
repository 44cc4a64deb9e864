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


# ---------------------------------------------------------------------------
# per-field mapping params: ignore_above / null_value / ignore_malformed /
# coerce / copy_to  (KeywordFieldMapper.java, NumberFieldMapper.java,
# IgnoredFieldMapper.java, FieldMapper.java copyTo;
# rest-api-spec/test/search.highlight/40_keyword_ignore.yml)
# ---------------------------------------------------------------------------

PARAM_MAPPING = {
    "properties": {
        "tag": {"type": "keyword", "ignore_above": 5},
        "status": {"type": "keyword", "null_value": "NULL_SUB"},
        "views": {"type": "long", "ignore_malformed": True},
        "score": {"type": "long"},
        "first": {"type": "text", "copy_to": ["full_name"]},
        "last": {"type": "text", "copy_to": ["full_name"]},
    }
}


def _parse(spark, rows, mapping=PARAM_MAPPING, dynamic="false"):
    raw = spark.createDataFrame(rows, "id long, body string")
    return doc_parse.parse_documents(spark, raw, "body", mapping, dynamic=dynamic, id_col="id")


def test_ignore_above_nulls_long_keywords(spark):
    parsed, rejects = _parse(spark, [
        (1, '{"tag": "short"}'),          # len 5 — kept (<=)
        (2, '{"tag": "toolongvalue"}'),   # len 12 — not indexed
    ])
    assert rejects.count() == 0
    rows = {r["id"]: r for r in parsed.collect()}
    assert rows[1]["tag"] == "short"
    assert rows[2]["tag"] is None
    # still in _source (stored, just not indexed)
    assert "toolongvalue" in rows[2]["_source"]


def test_null_value_substitutes_explicit_null_only(spark):
    parsed, _ = _parse(spark, [
        (1, '{"status": null}'),   # explicit null -> substitute
        (2, '{"tag": "x"}'),       # absent -> stays null
        (3, '{"status": "ok"}'),
    ])
    rows = {r["id"]: r for r in parsed.collect()}
    assert rows[1]["status"] == "NULL_SUB"
    assert rows[2]["status"] is None
    assert rows[3]["status"] == "ok"


def test_ignore_malformed_nulls_and_records_ignored(spark):
    parsed, rejects = _parse(spark, [
        (1, '{"views": 10}'),
        (2, '{"views": "not-a-number"}'),  # malformed, ignore_malformed: true
    ])
    assert rejects.count() == 0
    rows = {r["id"]: r for r in parsed.collect()}
    assert rows[1]["views"] == 10 and list(rows[1]["_ignored"]) == []
    assert rows[2]["views"] is None and list(rows[2]["_ignored"]) == ["views"]


def test_malformed_without_flag_rejects_document(spark):
    parsed, rejects = _parse(spark, [
        (1, '{"score": 7}'),
        (2, '{"score": "seven"}'),  # no ignore_malformed -> item-level failure
    ])
    assert [r["id"] for r in parsed.collect()] == [1]
    rej = rejects.collect()
    assert len(rej) == 1 and rej[0]["id"] == 2
    assert "mapper_parsing_exception" in rej[0]["_reason"]


def test_coerce_numeric_strings(spark):
    # coerce: true default — "42" and "4.5" index as numbers on a long field
    parsed, rejects = _parse(spark, [
        (1, '{"score": "42"}'),
        (2, '{"score": "4.5"}'),
    ])
    assert rejects.count() == 0
    rows = {r["id"]: r for r in parsed.collect()}
    assert rows[1]["score"] == 42
    assert rows[2]["score"] == 4


def test_copy_to_concatenates_sources(spark):
    parsed, _ = _parse(spark, [
        (1, '{"first": "john", "last": "smith"}'),
        (2, '{"first": "solo"}'),
        (3, '{"tag": "x"}'),
    ])
    rows = {r["id"]: r for r in parsed.collect()}
    assert rows[1]["full_name"] == "john smith"
    assert rows[2]["full_name"] == "solo"
    assert rows[3]["full_name"] is None


def test_date_nanos_field(spark):
    """date_nanos (DateFieldMapper.Resolution.NANOSECONDS,
    search/240_date_nanos.yml): nanosecond precision preserved as
    epoch-nanos long — values differing only past microseconds still
    sort distinctly; bare numbers parse as epoch_millis."""
    rows = [
        (1, '{"t": "2024-01-01T12:00:00.123456789Z"}'),
        (2, '{"t": "2024-01-01T12:00:00.123456788Z"}'),
        (3, '{"t": "2024-01-01T12:00:00.123Z"}'),
        (4, '{"t": 1704110400123}'),
    ]
    raw = spark.createDataFrame(rows, "id long, body string")
    parsed, rejects = doc_parse.parse_documents(
        spark, raw, "body", {"properties": {"t": {"type": "date_nanos"}}},
        dynamic="false", id_col="id")
    assert rejects.count() == 0
    got = {r["id"]: r["t"] for r in parsed.collect()}
    assert got[1] == 1704110400123456789
    assert got[2] == 1704110400123456788
    assert got[1] > got[2]  # nano tail orders
    assert got[3] == 1704110400123000000
    assert got[4] == 1704110400123000000  # epoch_millis branch
    assert parsed.schema["t"].dataType.typeName() == "long"
