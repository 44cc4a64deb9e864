"""bucket_correlation + bucket_count_ks_test sibling pipeline aggs
(x-pack ml correlation/kstest): closed-form math sanity + the sibling
plumbing over a bucket frame."""

from __future__ import annotations

import math

import pytest

from elasticsearch_spark.plans.aggs import (
    apply_sibling,
    count_correlation,
    ks_test_counts,
)


def test_count_correlation_positive_relationship():
    # subset counts proportional to expectations -> strong positive corr
    exp = [10.0, 20.0, 30.0, 40.0]
    y = [1.0, 2.0, 3.0, 4.0]
    c = count_correlation(exp, None, 100.0, y)
    # the Bernoulli-membership approximation bounds |corr| by ~sqrt(w/(1-w)),
    # so a perfectly proportional subset at weight 0.1 lands well below 1
    assert c > 0.1
    # doubling the subset (same shape, higher weight) strengthens the signal
    assert count_correlation(exp, None, 100.0, [2.0, 4.0, 6.0, 8.0]) > c


def test_count_correlation_inverse_relationship():
    exp = [10.0, 20.0, 30.0, 40.0]
    y = [4.0, 3.0, 2.0, 1.0]
    assert count_correlation(exp, None, 100.0, y) < 0


def test_count_correlation_validations():
    with pytest.raises(ValueError, match="lengths do not match"):
        count_correlation([1.0, 2.0], None, 10.0, [1.0])
    with pytest.raises(ValueError, match="must cover"):
        count_correlation([1.0, 2.0], None, 1.0, [5.0, 5.0])
    # zero variance indicator -> NaN, like the reference
    assert math.isnan(count_correlation([5.0, 5.0], None, 100.0, [1.0, 2.0]))


def test_count_correlation_fractions_weighting():
    exp = [10.0, 20.0]
    got = count_correlation(exp, [0.5, 0.5], 100.0, [1.0, 3.0])
    uniform = count_correlation(exp, None, 100.0, [1.0, 3.0])
    assert got == pytest.approx(uniform)


def test_ks_uniform_counts_pvalue_one():
    res = ks_test_counts([10.0, 10.0, 10.0, 10.0], None, ["less", "greater", "two_sided"])
    # D == 0 in all directions -> p == 1 everywhere
    assert res["less"] == 1.0 and res["greater"] == 1.0
    assert res["two_sided"] == pytest.approx(1.0, abs=1e-6)


def test_ks_skewed_counts_small_p():
    # all mass in the last bucket: fx lags fy maximally -> "less" extreme
    res = ks_test_counts([0.0, 0.0, 0.0, 100.0], None, ["less", "greater", "two_sided"])
    assert res["less"] < 0.2
    assert res["greater"] == 1.0  # fx never exceeds fy
    assert 0.0 <= res["two_sided"] <= 1.0


def test_ks_empty_or_zero_is_nan():
    assert all(math.isnan(v) for v in ks_test_counts([], None, ["less"]).values())
    assert all(math.isnan(v) for v in ks_test_counts([0.0, 0.0], None, ["two_sided"]).values())


def test_sibling_plumbing(spark):
    b = spark.createDataFrame(
        [("a", 10), ("b", 20), ("c", 30)], "key string, doc_count long"
    )
    spec = {
        "bucket_correlation": {
            "buckets_path": "b>_count",
            "function": {
                "count_correlation": {
                    "indicator": {"expectations": [10.0, 20.0, 30.0], "doc_count": 600.0}
                }
            },
        }
    }
    row = apply_sibling({"b": b}, "corr", spec).collect()[0]
    assert row["corr"] > 0.1
    ks = apply_sibling(
        {"b": b},
        "ks",
        {"bucket_count_ks_test": {"buckets_path": "b>_count", "alternatives": ["two_sided"]}},
    ).collect()[0]
    assert 0.0 <= ks["ks.two_sided"] <= 1.0
