"""Anomaly detection core (plans/ml.py — x-pack ml documented subset) and
dense_vector int8 scalar quantization (operators/similarity.quantize_int8)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators.similarity import quantize_int8
from elasticsearch_spark.plans.ml import anomaly_detect


def _series(spark, spike_day: int = 5, n_days: int = 14, per_day: int = 10):
    """Steady 10-events/day with one 50-event spike on spike_day."""
    rows = []
    base = dt.datetime(2024, 1, 1)
    for d in range(n_days):
        n = 50 if d == spike_day else per_day
        for i in range(n):
            rows.append((base + dt.timedelta(days=d, seconds=i), "click", float(d * 100 + i)))
    return spark.createDataFrame(rows, "ts timestamp, event_type string, value double")


def test_count_detector_flags_spike(spark):
    out = anomaly_detect(_series(spark), "ts", 86400, "count").toPandas()
    assert len(out) == 14
    flagged = out[out.is_anomaly]
    assert len(flagged) == 1
    spike_ts = int(dt.datetime(2024, 1, 6, tzinfo=dt.timezone.utc).timestamp())
    assert int(flagged.iloc[0].bucket_ts) == spike_ts
    assert flagged.iloc[0].actual == 50.0
    assert flagged.iloc[0].typical == 10.0
    # steady days score 0 (|10-10| = 0)
    assert (out[~out.is_anomaly].score == 0.0).all()


def test_partitioned_baseline_is_per_partition(spark):
    # type "a": steady 10/day; type "b": steady 2/day. A 10-event day for
    # "b" is a 5x anomaly even though 10/day is normal for "a".
    rows = []
    base = dt.datetime(2024, 1, 1)
    for d in range(10):
        for i in range(10):
            rows.append((base + dt.timedelta(days=d, seconds=i), "a", 1.0))
        nb = 10 if d == 3 else 2
        for i in range(nb):
            rows.append((base + dt.timedelta(days=d, seconds=100 + i), "b", 1.0))
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, value double")
    out = anomaly_detect(df, "ts", 86400, "count", partition_field="event_type").toPandas()
    flagged = out[out.is_anomaly]
    assert set(flagged.event_type) == {"b"}
    assert len(flagged) == 1 and flagged.iloc[0].actual == 10.0


def test_mean_detector_and_validation(spark):
    df = _series(spark)
    out = anomaly_detect(df, "ts", 86400, "mean", field="value").toPandas()
    assert len(out) == 14 and {"actual", "typical", "score", "is_anomaly"} <= set(out.columns)
    with pytest.raises(ValueError):
        anomaly_detect(df, "ts", 86400, "mean")  # field required
    with pytest.raises(ValueError):
        anomaly_detect(df, "ts", 86400, "stddev")  # unsupported function


def test_quantize_int8_roundtrip(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = quantize_int8(df, "vec_id", "embedding").toPandas()
    assert len(out) == 200
    qmat = np.stack(out.sort_values("vec_id").qvec.to_numpy())
    # 7-bit range, ints
    assert qmat.min() >= 0 and qmat.max() <= 127
    # reconstruction error bounded by ~sqrt(dim)*step; step = range/127
    lo, hi = np.quantile(vecs.astype(np.float64).ravel(), [0.01, 0.99])
    step = (hi - lo) / 127
    # exact numpy re-derivation of the quantize→dequantize L2 error
    v64 = vecs.astype(np.float64)
    q_np = np.clip(np.floor((v64 - lo) / (hi - lo) * 127 + 0.5), 0, 127)
    expect = np.sqrt((((lo + q_np * (hi - lo) / 127) - v64) ** 2).sum(axis=1))
    got = out.sort_values("vec_id").recon_err.to_numpy()
    assert np.allclose(got, expect, atol=1e-5)
    # interior (unclipped) components are within half a quantization step
    interior = (v64 >= lo) & (v64 <= hi)
    assert (np.abs((lo + q_np * (hi - lo) / 127) - v64)[interior] <= step / 2 + 1e-9).all()
    # quantized-space cosine approximates original cosine (dequantized)
    dq = lo + qmat.astype(np.float64) * (hi - lo) / 127
    a, b = vecs[0].astype(np.float64), vecs[1].astype(np.float64)
    cos_orig = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    cos_dq = dq[0] @ dq[1] / (np.linalg.norm(dq[0]) * np.linalg.norm(dq[1]))
    assert abs(cos_orig - cos_dq) < 0.1
