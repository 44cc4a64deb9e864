"""Text-structure inference (x-pack/plugin/text-structure,
TextStructureFinderManager.java): format detection, header heuristic,
type merging, timestamp-format discovery, and the inferred-mapping →
Spark-DDL bridge that drives the distributed read."""

import pytest

from elasticsearch_spark.sources.text_structure import (
    find_structure,
    structure_to_spark_schema,
)


def test_ndjson_detected_with_types():
    sample = "\n".join(
        '{"id": %d, "name": "u%d", "score": %s, "ok": %s}'
        % (i, i, f"{i}.5", "true" if i % 2 else "false")
        for i in range(20)
    )
    st = find_structure(sample)
    assert st["format"] == "ndjson"
    assert st["num_lines_analyzed"] == 20
    assert st["mappings"]["id"]["type"] == "long"
    assert st["mappings"]["score"]["type"] == "double"
    assert st["mappings"]["ok"]["type"] == "boolean"
    assert st["mappings"]["name"]["type"] == "keyword"


def test_ndjson_timestamp_field():
    sample = "\n".join(
        '{"ts": "2024-03-0%dT10:00:00Z", "n": %d}' % (i + 1, i) for i in range(5)
    )
    st = find_structure(sample)
    assert st["timestamp_field"] == "ts"
    assert st["java_timestamp_formats"] == ["ISO8601"]


def test_ndjson_mixed_numeric_widens_to_double():
    st = find_structure(['{"x": 1}', '{"x": 2.5}'])
    assert st["mappings"]["x"]["type"] == "double"


def test_delimited_with_header():
    lines = ["name,age,joined"] + [
        f"user{i},{20 + i},2023-01-0{i + 1}T00:00:00Z" for i in range(5)
    ]
    st = find_structure(lines)
    assert st["format"] == "delimited"
    assert st["delimiter"] == ","
    assert st["has_header_row"] is True
    assert st["column_names"] == ["name", "age", "joined"]
    assert st["mappings"]["age"]["type"] == "long"
    assert st["mappings"]["joined"]["type"] == "date"
    assert st["timestamp_field"] == "joined"


def test_delimited_no_header_synthesizes_names():
    lines = [f"{i}\t{i * 2}\tword" for i in range(4)]
    st = find_structure(lines)
    assert st["format"] == "delimited"
    assert st["delimiter"] == "\t"
    assert st["has_header_row"] is False
    assert st["column_names"] == ["column1", "column2", "column3"]
    assert st["mappings"]["column1"]["type"] == "long"
    assert st["mappings"]["column3"]["type"] == "keyword"


def test_semi_structured_syslog_grok():
    lines = [
        "Mar  7 04:1%d:02 host sshd[123]: Accepted publickey for root" % i
        for i in range(4)
    ]
    st = find_structure(lines)
    assert st["format"] == "semi_structured_text"
    assert st["java_timestamp_formats"] == ["MMM dd HH:mm:ss"]
    assert st["timestamp_field"] == "timestamp"
    # the emitted name must match the detected format AND resolve in the
    # ingest grok bank (the infer-then-ingest handoff)
    assert "%{SYSLOGTIMESTAMP:timestamp}" in st["grok_pattern"]
    assert st["mappings"]["message"]["type"] == "text"
    from elasticsearch_spark.sources.ingest_pipeline import _grok_to_regex
    import re as _re

    rx, fields = _grok_to_regex(st["grok_pattern"])
    m = _re.match(rx, lines[0])
    assert m and fields == ["timestamp", "message"]
    assert m.group(1) == "Mar  7 04:10:02"


def test_semi_structured_no_timestamp():
    st = find_structure(["plainword"] * 3)
    assert st["format"] == "semi_structured_text"
    assert st["timestamp_field"] is None
    assert st["java_timestamp_formats"] == []


def test_empty_sample_raises():
    with pytest.raises(ValueError):
        find_structure("\n\n  \n")


def test_lines_to_sample_bounds_analysis():
    sample = ['{"x": %d}' % i for i in range(50)]
    st = find_structure(sample, lines_to_sample=10)
    assert st["num_lines_analyzed"] == 10


def test_structure_to_spark_schema_order_and_types():
    lines = ["a,b,c"] + [f"{i},{i}.5,2024-01-01T00:00:00Z" for i in range(3)]
    st = find_structure(lines)
    ddl = structure_to_spark_schema(st)
    assert ddl == "`a` long, `b` double, `c` timestamp"


def test_spark_roundtrip_from_json(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"t{i % 2}", i * 1.5) for i in range(30)], "id long, tag string, v double"
    )
    lines = df.select(F.to_json(F.struct("id", "tag", "v")).alias("ln"))
    sample = [r.ln for r in lines.limit(10).collect()]
    st = find_structure(sample)
    ddl = structure_to_spark_schema(st)
    parsed = lines.select(F.from_json("ln", ddl).alias("s")).select("s.*")
    got = parsed.groupBy("tag").agg(F.sum("v").alias("sv"), F.count("*").alias("n"))
    want = df.groupBy("tag").agg(F.sum("v").alias("sv"), F.count("*").alias("n"))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
