"""Field-type layer (plans/fields.py): range fields + relations, flattened,
token_count, match_only_text, aggregate_metric_double, version sort,
time_series agg."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from elasticsearch_spark.plans.dsl import SearchContext
from elasticsearch_spark.plans.fields import (
    FlattenedQ,
    MatchOnlyTextQ,
    RangeFieldQ,
    aggregate_metric_agg,
    aggregate_metric_struct,
    range_relation_pred,
    range_struct,
    time_series_agg,
    token_count_col,
    version_sort_key,
)


def _ranges(spark):
    # intervals: a=[0,10] b=[5,15] c=[20,30] d=[8,9]
    rows = [("a", 0, 10), ("b", 5, 15), ("c", 20, 30), ("d", 8, 9)]
    return spark.createDataFrame(rows, "id string, lo int, hi int").withColumn(
        "r", range_struct("lo", "hi")
    )


def _ids(df, q):
    ctx = SearchContext(df=df, key="id")
    return sorted(r.id for r in df.where(q.predicate(ctx)).select("id").collect())


def test_range_relation_intersects(spark):
    df = _ranges(spark)
    # query [8, 12]: a,b,d intersect; c doesn't
    assert _ids(df, RangeFieldQ(fld="r", gte=8, lte=12)) == ["a", "b", "d"]


def test_range_relation_within(spark):
    df = _ranges(spark)
    # fields fully inside query [0, 12]: a [0,10], d [8,9]
    assert _ids(df, RangeFieldQ(fld="r", gte=0, lte=12, relation="within")) == ["a", "d"]


def test_range_relation_contains(spark):
    df = _ranges(spark)
    # fields enclosing query [6, 9]: a [0,10], b [5,15]
    assert _ids(df, RangeFieldQ(fld="r", gte=6, lte=9, relation="contains")) == ["a", "b"]


def test_flattened_keyed_and_root_access(spark):
    rows = [
        ("a", '{"k": "10", "color": "red"}'),
        ("b", '{"k": "25"}'),
        ("c", '{"color": "green"}'),
    ]
    df = spark.createDataFrame(rows, "id string, props string")
    assert _ids(df, FlattenedQ(fld="props", key="color", op="term", value="red")) == ["a"]
    assert _ids(df, FlattenedQ(fld="props", key="k", op="exists")) == ["a", "b"]
    assert _ids(df, FlattenedQ(fld="props", key="k", op="range", gte=5, lte=20)) == ["a"]
    assert _ids(df, FlattenedQ(fld="props", key="color", op="prefix", value="gr")) == ["c"]
    # root access: any leaf value
    assert _ids(df, FlattenedQ(fld="props", op="term", value="red")) == ["a"]


def test_token_count_col(spark):
    df = spark.createDataFrame([("a", "Hello brave new world"), ("b", "one")], "id string, text string")
    got = {r.id: r.tc for r in df.select("id", token_count_col("text").alias("tc")).collect()}
    assert got == {"a": 4, "b": 1}


def test_match_only_text_scores_sum_of_idf(spark):
    rows = [
        ("a", "spark spark spark engine"),  # tf must NOT matter
        ("b", "spark engine"),
        ("c", "engine room"),
        ("d", "nothing here"),
    ]
    df = spark.createDataFrame(rows, "id string, text string")
    ctx = SearchContext(df=df, key="id")
    out = {
        r["__key"]: r["_score"]
        for r in MatchOnlyTextQ(text="spark engine").frame(ctx).collect()
    }
    n = 4.0
    idf = lambda dfreq: math.log(1.0 + (n - dfreq + 0.5) / (dfreq + 0.5))
    # spark df=2, engine df=3
    assert math.isclose(out["a"], idf(2) + idf(3), rel_tol=1e-9)
    assert math.isclose(out["a"], out["b"], rel_tol=1e-9)  # tf=3 scores same as tf=1
    assert math.isclose(out["c"], idf(3), rel_tol=1e-9)
    assert "d" not in out


def test_aggregate_metric_exact_reaggregation(spark):
    import random

    rnd = random.Random(7)
    rows = [(i, "g%d" % (i % 3), rnd.uniform(0, 100)) for i in range(500)]
    df = spark.createDataFrame(rows, "i long, g string, v double")
    partials = df.groupBy("g", (F.col("i") % 10).alias("chunk")).agg(
        F.min("v").alias("mn"), F.max("v").alias("mx"),
        F.sum("v").alias("sm"), F.count("v").alias("ct"),
    ).select("g", aggregate_metric_struct("mn", "mx", "sm", "ct").alias("m"))
    re_agg = partials.groupBy("g").agg(
        aggregate_metric_agg("m", "min").alias("mn"),
        aggregate_metric_agg("m", "max").alias("mx"),
        aggregate_metric_agg("m", "sum").alias("sm"),
        aggregate_metric_agg("m", "avg").alias("av"),
        aggregate_metric_agg("m", "value_count").alias("ct"),
    )
    raw = df.groupBy("g").agg(
        F.min("v").alias("mn"), F.max("v").alias("mx"), F.sum("v").alias("sm"),
        F.avg("v").alias("av"), F.count("v").alias("ct"),
    )
    got = {r.g: r for r in re_agg.collect()}
    want = {r.g: r for r in raw.collect()}
    for g in want:
        assert got[g].mn == want[g].mn and got[g].mx == want[g].mx
        assert math.isclose(got[g].sm, want[g].sm, rel_tol=1e-12)
        assert math.isclose(got[g].av, want[g].av, rel_tol=1e-12)
        assert got[g].ct == want[g].ct


def test_version_sort_order(spark):
    versions = ["1.0.0", "1.0.0-alpha", "1.0.0-beta.2", "1.2.0", "1.10.0", "0.9.9", "2.0.0-rc.1"]
    df = spark.createDataFrame([(v,) for v in versions], "v string")
    got = [r.v for r in df.orderBy(version_sort_key("v")).collect()]
    assert got == [
        "0.9.9",
        "1.0.0-alpha",
        "1.0.0-beta.2",
        "1.0.0",       # release after its pre-releases
        "1.2.0",
        "1.10.0",      # numeric, not lexicographic (10 > 2)
        "2.0.0-rc.1",
    ]


def test_time_series_buckets(spark):
    rows = [("web", 1, 5.0), ("web", 1, 7.0), ("web", 2, 1.0), ("db", 1, 3.0)]
    df = spark.createDataFrame(rows, "svc string, host int, v double")
    out = time_series_agg(df, ["svc", "host"], {"max_v": F.max("v")}).collect()
    assert [(r.svc, r.host, r.doc_count, r.max_v) for r in out] == [
        ("db", 1, 1, 3.0),
        ("web", 1, 2, 7.0),
        ("web", 2, 1, 1.0),
    ]


def test_unsigned_long_shift_roundtrip_and_order(spark):
    """mapper-unsigned-long: shifted encoding preserves u64 order under
    native long sort; decode round-trips; range bounds shift driver-side."""
    from decimal import Decimal

    from elasticsearch_spark.plans.fields import (
        unsigned_long_decode,
        unsigned_long_encode,
        unsigned_long_range_pred,
    )

    vals = ["0", "1", "9223372036854775807", "9223372036854775808",
            "18446744073709551615"]
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    enc = df.select("u", unsigned_long_encode("u").alias("e"))
    rows = enc.orderBy("e").collect()
    assert [r["u"] for r in rows] == vals  # signed order == unsigned order
    assert rows[0]["e"] == -(2**63) and rows[-1]["e"] == 2**63 - 1
    dec = enc.select(unsigned_long_decode("e").cast("string").alias("u2"), "u")
    assert all(r["u2"] == r["u"] for r in dec.collect())
    hits = enc.where(unsigned_long_range_pred("e", gte=2**63)).count()
    assert hits == 2


def test_constant_keyword_resolves_from_mapping(spark):
    """mapper-constant-keyword: queries resolve to match_all/match_none
    from the mapping constant alone — no data access."""
    from elasticsearch_spark.plans.fields import constant_keyword_matches as m

    assert m("logs-prod", "term", {"value": "logs-prod"})
    assert not m("logs-prod", "term", "logs-dev")
    assert m("logs-prod", "terms", ["a", "logs-prod"])
    assert m("logs-prod", "prefix", "logs-")
    assert m("logs-prod", "wildcard", "logs-*")
    assert m("logs-prod", "regexp", "logs-(prod|dev)")
    assert m("logs-prod", "exists", None)
    assert not m(None, "exists", None)
    assert not m(None, "term", "x")
    assert m("m", "range", {"gte": "a", "lte": "z"})
    import pytest as _pt
    with _pt.raises(ValueError):
        m("x", "fuzzy", "y")


def test_version_sort_prefix_versions(spark):
    """A version that is a dotted prefix of a longer one must sort FIRST
    (variable-length cores used to invert 1.0 vs 1.0.1 at the separator)."""
    versions = ["1.0.1", "1.0", "1.0.0", "1.2.3.4", "1.2.3", "1.0.0-alpha"]
    df = spark.createDataFrame([(v,) for v in versions], "v string")
    got = [r.v for r in df.orderBy(version_sort_key("v")).collect()]
    assert got == ["1.0", "1.0.0-alpha", "1.0.0", "1.0.1", "1.2.3", "1.2.3.4"]


def test_range_field_one_sided_bounds(spark):
    """A missing gte/lte in a range query over a range FIELD is unbounded
    — comparing against lit(None) used to null the predicate and match
    nothing."""
    df = spark.createDataFrame(
        [(1, (5, 10)), (2, (20, 30)), (3, (None, 3))],
        "id long, r struct<gte:long, lte:long>")
    pred = lambda **kw: {r.id for r in df.where(
        range_relation_pred("r", kw.get("gte"), kw.get("lte"),
                            kw.get("relation", "intersects"))).collect()}
    assert pred(gte=8) == {1, 2}            # lte open: everything ending >= 8
    assert pred(lte=6) == {1, 3}            # gte open; null field gte = -inf
    assert pred(gte=4, lte=35, relation="within") == {1, 2}
    assert pred(gte=6, lte=9, relation="contains") == {1}
    assert pred(lte=2, relation="contains") == {3}  # needs open field start
