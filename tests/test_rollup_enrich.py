"""Rollup materialization + enrich processor (x-pack rollup / enrich)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.plans.rollup import build_rollup, rollup_search
from elasticsearch_spark.sources.ingest_pipeline import run_pipeline


@pytest.fixture(scope="module")
def raw(spark):
    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(200):
        rows.append((base + dt.timedelta(minutes=17 * i), ["a", "b"][i % 2], float(i % 13)))
    return spark.createDataFrame(rows, "ts timestamp, cat string, v double").cache()


def test_rollup_equals_direct(spark, raw):
    rolled = build_rollup(raw, {
        "groups": {"date_histogram": {"field": "ts", "calendar_interval": "1h"},
                   "terms": {"fields": ["cat"]}},
        "metrics": [{"field": "v", "metrics": ["min", "max", "sum", "avg"]}],
    })
    assert rolled.count() < raw.count()  # actually pre-aggregated
    got = rollup_search(rolled, {
        "daily": {"date_histogram": {"field": "ts", "calendar_interval": "1d"},
                  "aggs": {"sv": {"sum": {"field": "v"}},
                           "mx": {"max": {"field": "v"}},
                           "av": {"avg": {"field": "v"}}}},
    }).collect()
    direct = (
        raw.groupBy(F.date_trunc("day", "ts").alias("key"))
        .agg(F.count("*").alias("doc_count"), F.sum("v").alias("sv"),
             F.max("v").alias("mx"), F.avg("v").alias("av"))
        .orderBy("key")
        .collect()
    )
    assert len(got) == len(direct)
    for a, b in zip(got, direct):
        assert a["key"] == b["key"] and a["doc_count"] == b["doc_count"]
        assert a["sv"] == pytest.approx(b["sv"])
        assert a["mx"] == b["mx"]
        assert a["av"] == pytest.approx(b["av"])


def test_enrich_processor(spark):
    docs = spark.createDataFrame(
        [("u1", "de"), ("u2", "fr"), ("u3", "xx")], "url string, lang string"
    )
    policy = spark.createDataFrame(
        [("de", "German", "Germany"), ("fr", "French", "France")],
        "code string, language string, country string",
    )
    out = run_pipeline(docs, [
        {"enrich": {"field": "lang", "match_field": "code",
                    "_lookup_df": policy, "target_field": "geo"}},
        {"set": {"field": "tagged", "value": "y"}},
    ]).collect()
    by_url = {r["url"]: r.asDict() for r in out}
    assert by_url["u1"]["geo.country"] == "Germany"
    assert by_url["u2"]["geo.language"] == "French"
    assert by_url["u3"]["geo.country"] is None  # left join keeps unmatched
