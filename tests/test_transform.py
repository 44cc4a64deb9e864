"""Transforms (x-pack/plugin/transform): pivot, latest, and the continuous
change-detection checkpoint cycle (TransformIndexer.java semantics)."""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.plans import transform as xform

T0 = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def src(spark):
    rows = [
        # (id, ts, user, kind, value)
        (0, T0 + dt.timedelta(hours=1), 1, "a", 10.0),
        (1, T0 + dt.timedelta(hours=2), 1, "b", 20.0),
        (2, T0 + dt.timedelta(hours=3), 2, "a", 5.0),
        (3, T0 + dt.timedelta(days=1, hours=1), 2, "a", 7.0),
        (4, T0 + dt.timedelta(days=1, hours=2), 3, "c", 1.0),
        (5, T0 + dt.timedelta(days=2), 1, "a", 40.0),
    ]
    return spark.createDataFrame(rows, "id long, ts timestamp, user long, kind string, value double")


PIVOT_CFG = {
    "group_by": {"u": {"terms": {"field": "user"}}},
    "aggregations": {
        "total": {"sum": {"field": "value"}},
        "n": {"value_count": {"field": "id"}},
        "kinds": {"cardinality": {"field": "kind"}},
        "hi": {"max": {"field": "value"}},
    },
}


def test_pivot_terms(src):
    out = {r["u"]: r for r in xform.pivot(src, PIVOT_CFG).collect()}
    assert out[1]["total"] == 70.0 and out[1]["n"] == 3 and out[1]["kinds"] == 2
    assert out[2]["total"] == 12.0 and out[2]["kinds"] == 1
    assert out[3]["hi"] == 1.0


def test_pivot_date_histogram_and_histogram(src):
    cfg = {
        "group_by": {
            "day": {"date_histogram": {"field": "ts", "calendar_interval": "1d"}},
            "vbin": {"histogram": {"field": "value", "interval": 10.0}},
        },
        "aggregations": {"n": {"value_count": {"field": "id"}}},
    }
    out = {(r["day"].day, r["vbin"]): r["n"] for r in xform.pivot(src, cfg).collect()}
    assert out[(1, 10.0)] == 1 and out[(1, 20.0)] == 1 and out[(1, 0.0)] == 1
    assert out[(2, 0.0)] == 2 and out[(3, 40.0)] == 1


def test_pivot_fixed_interval(src):
    cfg = {
        "group_by": {"h12": {"date_histogram": {"field": "ts", "fixed_interval": "12h"}}},
        "aggregations": {"n": {"value_count": {"field": "id"}}},
    }
    out = {r["h12"]: r["n"] for r in xform.pivot(src, cfg).collect()}
    assert out[T0] == 3  # first three rows fall in [00:00, 12:00)
    assert sum(out.values()) == 6


def test_latest(src):
    out = {(r["user"], r["kind"]): r for r in
           xform.latest(src, {"unique_key": ["user", "kind"], "sort": "ts"}).collect()}
    assert out[(1, "a")]["id"] == 5 and out[(1, "a")]["value"] == 40.0
    assert out[(2, "a")]["id"] == 3
    assert len(out) == 4


def test_latest_tie_break(spark):
    # equal sort values: deterministic lexicographic max over remaining cols
    df = spark.createDataFrame(
        [(1, T0, 7, "x", 1.0), (2, T0, 7, "x", 2.0)],
        "id long, ts timestamp, user long, kind string, value double")
    out = xform.latest(df, {"unique_key": ["user"], "sort": "ts"}).collect()
    assert len(out) == 1 and out[0]["id"] == 2


def test_checkpoint_incremental_equals_batch(src):
    """The TransformIndexer contract: after a checkpoint cycle the dest is
    byte-identical to a from-scratch pivot — including the non-mergeable
    cardinality agg, because changed entities are re-aggregated over the
    FULL source, not merged."""
    cut = src.where(F.col("ts") < T0 + dt.timedelta(days=1))
    dest, ckpt = xform.apply_checkpoint(cut, None, PIVOT_CFG, "ts", None)
    assert ckpt == T0 + dt.timedelta(hours=3)
    # bootstrap == pivot of the first slice
    assert {r["u"]: r["n"] for r in dest.collect()} == {1: 2, 2: 1}

    dest2, ckpt2 = xform.apply_checkpoint(src, dest, PIVOT_CFG, "ts", ckpt)
    assert ckpt2 == T0 + dt.timedelta(days=2)
    got = sorted(map(tuple, dest2.collect()))
    want = sorted(map(tuple, xform.pivot(src, PIVOT_CFG).collect()))
    assert got == want


def test_checkpoint_no_changes_is_noop(src):
    dest, ckpt = xform.apply_checkpoint(src, None, PIVOT_CFG, "ts", None)
    dest2, ckpt2 = xform.apply_checkpoint(src, dest, PIVOT_CFG, "ts", ckpt)
    assert ckpt2 == ckpt
    assert sorted(map(tuple, dest2.collect())) == sorted(map(tuple, dest.collect()))


def test_checkpoint_derived_key_no_collision(src):
    """Derived group keys (date buckets) must not collide with source column
    names during change detection (__gk_ prefixing)."""
    cfg = {
        "group_by": {"ts": {"date_histogram": {"field": "ts", "calendar_interval": "1d"}}},
        "aggregations": {"n": {"value_count": {"field": "id"}}},
    }
    cut = src.where(F.col("ts") < T0 + dt.timedelta(days=2))
    dest, ckpt = xform.apply_checkpoint(cut, None, cfg, "ts", None)
    dest2, _ = xform.apply_checkpoint(src, dest, cfg, "ts", ckpt)
    assert sorted(map(tuple, dest2.collect())) == sorted(
        map(tuple, xform.pivot(src, cfg).collect()))


def test_pivot_skips_null_group_keys_and_continuous_stays_stable(spark):
    """composite missing_bucket=false default: docs without the group field
    are skipped — and a null bucket must never reach the dest, where the
    upsert anti-join could not match it (it would duplicate per checkpoint)."""
    rows = [
        (0, T0 + dt.timedelta(hours=1), 1, 10.0),
        (1, T0 + dt.timedelta(hours=2), None, 99.0),   # null entity
        (2, T0 + dt.timedelta(days=1), 1, 5.0),
        (3, T0 + dt.timedelta(days=1, hours=1), None, 7.0),
    ]
    src = spark.createDataFrame(rows, "id long, ts timestamp, user long, value double")
    cfg = {"group_by": {"u": {"terms": {"field": "user"}}},
           "aggregations": {"total": {"sum": {"field": "value"}}}}
    batch = xform.pivot(src, cfg).collect()
    assert [(r["u"], r["total"]) for r in batch] == [(1, 15.0)]
    cut = src.where(F.col("ts") < T0 + dt.timedelta(days=1))
    dest, ckpt = xform.apply_checkpoint(cut, None, cfg, "ts", None)
    dest2, _ = xform.apply_checkpoint(src, dest, cfg, "ts", ckpt)
    dest3, _ = xform.apply_checkpoint(src, dest2, cfg, "ts", ckpt)
    assert sorted(map(tuple, dest3.collect())) == [(1, 15.0)]
