"""Round-3 surface: random_sampler agg, TSDB downsample, ES|QL INLINESTATS."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from elasticsearch_spark.plans.aggs import compile_agg
from elasticsearch_spark.plans.esql import esql
from elasticsearch_spark.plans.rollup import downsample


def _events(spark, n=1000):
    base = dt.datetime(2024, 3, 1)
    rows = [
        (i, base + dt.timedelta(minutes=17 * i), "a" if i % 3 else "b", float(i % 50))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, et string, value double")


def test_random_sampler_scales_counts(spark):
    df = _events(spark)
    out = compile_agg(
        df,
        "s",
        {
            "random_sampler": {"probability": 0.2, "seed": 0, "_key_field": "event_id"},
            "aggs": {
                "n_val": {"value_count": {"field": "value"}},
                "avg_val": {"avg": {"field": "value"}},
            },
        },
    ).collect()[0]
    # mirror the engine's deterministic coin: (id % 1000003)*7919 % 1e6 < 0.2e6
    kept = [i for i in range(1000) if (i % 1000003) * 7919 % 1_000_000 < 200_000]
    assert 100 < len(kept) < 300  # ~20% of 1000
    assert out["doc_count"] == round(len(kept) / 0.2)
    assert out["n_val"] == round(len(kept) / 0.2)
    # avg is a ratio estimator: unscaled, equals the sample mean
    expect = sum(float(i % 50) for i in kept) / len(kept)
    assert abs(out["avg_val"] - expect) < 1e-9
    # determinism: same seed → identical result
    again = compile_agg(
        df, "s",
        {"random_sampler": {"probability": 0.2, "seed": 0, "_key_field": "event_id"},
         "aggs": {"n_val": {"value_count": {"field": "value"}}}},
    ).collect()[0]
    assert again["n_val"] == out["n_val"]


def test_downsample_partials_are_exact(spark):
    df = _events(spark)
    out = downsample(df, "ts", "1d", ["et"], ["value"])
    pdf = out.toPandas()
    # partials re-aggregate exactly to the raw totals
    assert pdf["_doc_count"].sum() == 1000
    assert abs(pdf["value_sum"].sum() - sum(float(i % 50) for i in range(1000))) < 1e-6
    # avg from partials == raw avg (mergeable decomposition)
    raw_avg = df.agg(F.avg("value")).first()[0]
    assert abs(pdf["value_sum"].sum() / pdf["value_value_count"].sum() - raw_avg) < 1e-9
    # a second, coarser pass over the partials stays exact (sum of sums)
    import pytest

    with pytest.raises(ValueError):
        downsample(df, "ts", "1w", ["et"], ["value"])  # calendar unit rejected


def test_inlinestats_keeps_rows_and_joins_group_stats(spark):
    df = _events(spark, 300)
    out = esql(spark, """
FROM e
| INLINESTATS avg_v = AVG(value), n = COUNT(*) BY et
| EVAL rel = value / avg_v
""", {"e": df})
    pdf = out.toPandas()
    assert len(pdf) == 300  # rows preserved
    by_et = pdf.groupby("et").first()
    raw = df.groupBy("et").agg(F.avg("value").alias("a"), F.count("*").alias("n")).toPandas().set_index("et")
    for et in raw.index:
        assert abs(by_et.loc[et, "avg_v"] - raw.loc[et, "a"]) < 1e-9
        assert by_et.loc[et, "n"] == raw.loc[et, "n"]
    # global (no BY) variant: single stat broadcast to all rows
    g = esql(spark, "FROM e | INLINESTATS m = MAX(value)", {"e": df}).toPandas()
    assert len(g) == 300 and g["m"].nunique() == 1
