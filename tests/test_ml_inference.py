"""Trained-model registry + inference pipeline agg + time_series agg +
anomaly job / datafeed CRUD (x-pack ml surface).

Reference: x-pack/plugin/ml ``InferencePipelineAggregationBuilder.java``
(per-bucket trained-model inference), ``TimeSeriesAggregationBuilder.java``
(TSDB per-_tsid buckets), ``TransportPutTrainedModelAction`` /
``DatafeedConfig.java`` (model + job + datafeed CRUD and the lookback run).
"""
from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine
from elasticsearch_spark.plans.aggs import aggregate

# one stump per feature: value = 10 if doc_count > 2 else 1, plus
# 0.5 * (avg_len > 100 ? 1 : 0) — exercises multi-tree weighted_sum and
# feature names that are NOT SQL-safe identifiers (dots).
MODEL = {
    "trained_models": [
        {
            "feature_names": ["bucket.count"],
            "tree_structure": [
                {"node_index": 0, "split_feature": 0, "threshold": 2.0,
                 "left_child": 1, "right_child": 2},
                {"node_index": 1, "left_child": -1, "leaf_value": 1.0},
                {"node_index": 2, "left_child": -1, "leaf_value": 10.0},
            ],
        },
        {
            "feature_names": ["avg.len"],
            "tree_structure": [
                {"node_index": 0, "split_feature": 0, "threshold": 100.0,
                 "left_child": 1, "right_child": 2},
                {"node_index": 1, "left_child": -1, "leaf_value": 0.0},
                {"node_index": 2, "left_child": -1, "leaf_value": 1.0},
            ],
        },
    ],
    "aggregate_output": {"weighted_sum": {"weights": [1.0, 0.5]}},
}


@pytest.fixture()
def frame(spark):
    rows = [
        ("a", "h1", 10, "2024-01-01 00:05:00"),
        ("a", "h1", 20, "2024-01-01 00:20:00"),
        ("a", "h2", 30, "2024-01-01 01:05:00"),
        ("b", "h1", 300, "2024-01-01 00:10:00"),
        ("b", "h2", 150, "2024-01-01 02:10:00"),
        ("a", "h1", 40, "2024-01-01 02:40:00"),
    ]
    return spark.createDataFrame(
        rows, "svc string, host string, len int, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def test_time_series_agg(frame):
    out = aggregate(frame, {
        "series": {
            "time_series": {"dimensions": ["svc", "host"]},
            "aggs": {"avg_len": {"avg": {"field": "len"}}},
        }
    })["series"].collect()
    keys = [r["key"] for r in out]
    assert keys == ["svc=a,host=h1", "svc=a,host=h2", "svc=b,host=h1", "svc=b,host=h2"]
    by = {r["key"]: r for r in out}
    assert by["svc=a,host=h1"]["doc_count"] == 3
    assert by["svc=a,host=h1"]["avg_len"] == pytest.approx(70 / 3)
    assert by["svc=b,host=h1"]["doc_count"] == 1


def test_inference_pipeline_agg_inline_model(frame):
    out = aggregate(frame, {
        "by_svc": {
            "terms": {"field": "svc"},
            "aggs": {
                "avg_len": {"avg": {"field": "len"}},
                "score": {"inference": {
                    "model": MODEL,
                    "buckets_path": {"bucket.count": "_count",
                                     "avg.len": "avg_len"},
                }},
            },
        }
    })["by_svc"].collect()
    by = {r["key"]: r for r in out}
    # svc=a: 4 docs (>2 → 10), avg_len=25 (≤100 → 0)  → 10.0
    # svc=b: 2 docs (≤2 → 1), avg_len=225 (>100 → .5) → 1.5
    assert by["a"]["score"] == pytest.approx(10.0)
    assert by["b"]["score"] == pytest.approx(1.5)


@pytest.fixture()
def engine(spark, tmp_path):
    root = str(tmp_path / "ml_engine")
    shutil.rmtree(root, ignore_errors=True)
    return Engine(spark, root=root)


def test_trained_model_crud_and_infer(engine):
    engine.put_trained_model(
        "m1", {"definition": {"trained_model": {"ensemble": MODEL}}})
    assert engine.get_trained_model("m1")["definition"]["ensemble"] == MODEL
    vals = engine.infer_trained_model(
        "m1", [{"bucket.count": 5, "avg.len": 200.0},
               {"bucket.count": 1, "avg.len": 50.0},
               {"bucket.count": 5}])  # missing feature → default_left
    assert vals == pytest.approx([10.5, 1.0, 10.0])
    # registry survives a fresh Engine on the same root (driver restart)
    from elasticsearch_spark.operators import ltr as ltr_mod

    ltr_mod.TRAINED_MODELS.clear()
    e2 = Engine(engine.spark, root=engine.root)
    assert e2.infer_trained_model("m1", [{"bucket.count": 3, "avg.len": 0}]) \
        == pytest.approx([10.0])
    e2.delete_trained_model("m1")
    with pytest.raises(KeyError):
        e2.infer_trained_model("m1", [{}])


def test_inference_agg_by_model_id(engine, frame):
    engine.put_trained_model("m2", MODEL)
    out = aggregate(frame, {
        "by_svc": {
            "terms": {"field": "svc"},
            "aggs": {
                "avg_len": {"avg": {"field": "len"}},
                "score": {"inference": {
                    "model_id": "m2",
                    "buckets_path": {"bucket.count": "_count",
                                     "avg.len": "avg_len"},
                }},
            },
        }
    })["by_svc"].collect()
    assert {r["key"]: r["score"] for r in out} == pytest.approx(
        {"a": 10.0, "b": 1.5})


def test_anomaly_job_datafeed_end_to_end(engine, spark):
    # 24 hourly docs for url spacing; one burst hour with 30 extra docs
    rows = []
    for h in range(24):
        rows.append((f"https://e.com/p{h}", f"2024-03-01 {h:02d}:10:00",
                     "steady page text", "en"))
    for i in range(30):
        rows.append((f"https://e.com/burst{i}", "2024-03-01 13:30:00",
                     "burst page text", "en"))
    docs = spark.createDataFrame(
        rows, "url string, warc_ts string, text string, lang string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))
    engine.create_index("pages_ml", num_partitions=2)
    engine.bulk("pages_ml", docs)
    engine.put_anomaly_job("job1", {
        "analysis_config": {"bucket_span": "1h",
                            "detectors": [{"function": "count"}]},
        "data_description": {"time_field": "warc_ts"},
    })
    engine.put_datafeed("feed1", {"job_id": "job1", "indices": ["pages_ml"],
                                  "query": {"term": {"lang": "en"}}})
    recs = engine.start_datafeed("feed1").collect()
    anomalous = [r for r in recs if r["is_anomaly"]]
    assert len(anomalous) == 1
    assert anomalous[0]["bucket_ts"] == 1709298000  # 2024-03-01T13:00Z
    assert anomalous[0]["actual"] == 31.0
    # time-bounded run excludes the burst hour
    recs2 = engine.start_datafeed(
        "feed1", start="2024-03-01 00:00:00", end="2024-03-01 12:00:00"
    ).collect()
    assert not [r for r in recs2 if r["is_anomaly"]]
    with pytest.raises(KeyError):
        engine.put_datafeed("feedX", {"job_id": "nope", "indices": ["pages_ml"]})
