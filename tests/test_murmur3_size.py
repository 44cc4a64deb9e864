"""murmur3 field mapper (plugins/mapper-murmur3) and _size metadata field
(plugins/mapper-size) through the document-parse path."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_spark.sources.doc_parse import mapping_to_schema, parse_documents

MAPPING = {
    "_size": {"enabled": True},
    "properties": {
        "name": {"type": "murmur3"},
        "n": {"type": "long"},
    },
}


def _parse(spark, rows):
    raw = spark.createDataFrame(rows, "js string")
    return parse_documents(spark, raw, "js", MAPPING)[0]


def test_murmur3_schema_is_long():
    schema = mapping_to_schema({"properties": {"h": {"type": "murmur3"}}})
    assert schema["h"].dataType.typeName() == "long"


def test_murmur3_hashes_stable_and_distinct(spark):
    df = _parse(spark, [('{"name":"alice","n":1}',), ('{"name":"bob","n":2}',),
                        ('{"name":"alice","n":3}',)])
    rows = df.collect()
    hashes = {r["name"] for r in rows}
    assert all(isinstance(r["name"], int) for r in rows)
    assert len(hashes) == 2  # same value -> same hash, different -> different
    # cardinality over the hash == cardinality over the value
    assert df.agg(F.countDistinct("name")).collect()[0][0] == 2


def test_murmur3_null_value(spark):
    df = _parse(spark, [('{"n":5}',)])
    assert df.collect()[0]["name"] is None or isinstance(df.collect()[0]["name"], int)


def test_size_is_source_byte_length(spark):
    js = '{"name":"álice","n":1}'
    df = _parse(spark, [(js,)])
    row = df.collect()[0]
    assert row["_size"] == len(js.encode("utf-8"))  # bytes, not chars
    assert row["_source"] == js


def test_size_absent_when_disabled(spark):
    raw = spark.createDataFrame([('{"n":1}',)], "js string")
    df, _ = parse_documents(spark, raw, "js", {"properties": {"n": {"type": "long"}}})
    assert "_size" not in df.columns


def test_murmur3_missing_field_is_null(spark):
    """A doc without the murmur3 field indexes NO hash value (the mapper
    indexes nothing) — xxhash64(NULL) would return the seed and give every
    absent field one phantom shared hash."""
    df = _parse(spark, [('{"name":"alice","n":1}',), ('{"n":2}',)])
    rows = {r["n"]: r["name"] for r in df.collect()}
    assert rows[1] is not None and rows[2] is None
