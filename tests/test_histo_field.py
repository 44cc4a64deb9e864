"""Histogram field type (x-pack analytics HistogramFieldMapper.java) —
histo-backed metric reducers + exact weighted percentiles (plans/aggs.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.plans import aggs


@pytest.fixture(scope="module")
def hdocs(spark):
    # two groups; doc 3 carries a zero-count centroid that must be ignored
    rows = [
        ("a", [1.0, 2.0, 5.0], [3, 1, 1]),
        ("a", [2.0, 4.0], [2, 2]),
        ("b", [10.0, 20.0], [1, 1]),
        ("b", [30.0, 99.0], [4, 0]),
    ]
    return spark.createDataFrame(
        rows, "g string, vs array<double>, cs array<long>"
    ).select("g", F.struct(F.col("vs").alias("values"),
                           F.col("cs").alias("counts")).alias("h")).cache()


def test_histo_metrics_global(hdocs):
    out = aggs.compile_agg(hdocs, "m", {"stats": {"field": "h"}}).collect()[0]
    # multiset: a → 1×3, 2×1, 5×1, 2×2, 4×2 ; b → 10, 20, 30×4
    assert out["m.count"] == 15
    assert out["m.min"] == 1.0 and out["m.max"] == 30.0  # 99 has count 0
    assert out["m.sum"] == pytest.approx(3 + 2 + 5 + 4 + 8 + 10 + 20 + 120)
    assert out["m.avg"] == pytest.approx(172 / 15)


def test_histo_metrics_under_buckets(hdocs):
    out = {
        r["key"]: r
        for r in aggs.compile_agg(
            hdocs, "t",
            {"terms": {"field": "g"}, "aggs": {"s": {"sum": {"field": "h"}},
                                               "n": {"value_count": {"field": "h"}}}},
        ).collect()
    }
    assert out["a"]["s"] == pytest.approx(22.0) and out["a"]["n"] == 9
    assert out["b"]["s"] == pytest.approx(150.0) and out["b"]["n"] == 6


def test_histo_percentiles_and_ranks(hdocs):
    p = aggs.compile_agg(
        hdocs, "p", {"percentiles": {"field": "h", "percents": [50]}}
    ).collect()[0]
    # expanded sorted multiset: 1,1,1,2,2,2,4,4,5,10,20,30,30,30,30 → median 4
    assert p["p.50"] == pytest.approx(4.0)
    r = aggs.compile_agg(
        hdocs, "r", {"percentile_ranks": {"field": "h", "values": [4.0]}}
    ).collect()[0]
    assert r["r.4.0"] == pytest.approx(100.0 * 8 / 15)


def test_histo_histogram_bucket_and_boxplot(hdocs):
    hb = {
        r["key"]: r["doc_count"]
        for r in aggs.compile_agg(
            hdocs, "hb", {"histogram": {"field": "h", "interval": 10.0}}
        ).collect()
    }
    assert hb == {0.0: 9, 10.0: 1, 20.0: 1, 30.0: 4}
    bx = aggs.compile_agg(hdocs, "b", {"boxplot": {"field": "h"}}).collect()[0]
    assert bx["b.min"] == 1.0 and bx["b.max"] == 30.0
    assert bx["b.q2"] == pytest.approx(4.0)
