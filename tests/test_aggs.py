"""Aggregation compiler tests (plans/aggs.py) — ES aggs body semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.plans import aggs


@pytest.fixture(scope="module")
def frame(spark):
    rows = []
    for i in range(60):
        rows.append((
            i,
            ["a", "b", "c"][i % 3],
            float(i),
            dt.datetime(2024, 1, 1 + i % 5, i % 24),
            None if i % 10 == 0 else f"g{i % 4}",
        ))
    return spark.createDataFrame(rows, "id long, cat string, v double, ts timestamp, grp string").cache()


def rowmap(df, key="key"):
    return {r[key]: r.asDict() for r in df.collect()}


def test_terms_with_stats_subagg(spark, frame):
    out = aggs.aggregate(frame, {
        "cats": {"terms": {"field": "cat", "size": 2},
                 "aggs": {"vstats": {"stats": {"field": "v"}}}}
    })["cats"]
    got = rowmap(out)
    assert set(got) == {"a", "b"}  # tie on count → key asc
    assert got["a"]["doc_count"] == 20
    assert got["a"]["vstats.min"] == 0.0 and got["a"]["vstats.max"] == 57.0


def test_histogram_and_missing(spark, frame):
    out = aggs.aggregate(frame, {"h": {"histogram": {"field": "v", "interval": 20}}})["h"]
    got = rowmap(out)
    assert got[0.0]["doc_count"] == 20 and got[40.0]["doc_count"] == 20
    miss = aggs.aggregate(frame, {"m": {"missing": {"field": "grp"}}})["m"]
    got = rowmap(miss)
    assert got[True]["doc_count"] == 6


def test_date_histogram_with_pipeline(spark, frame):
    out = aggs.aggregate(frame, {
        "daily": {
            "date_histogram": {"field": "ts", "calendar_interval": "1d"},
            "aggs": {
                "avg_v": {"avg": {"field": "v"}},
                "cum": {"cumulative_sum": {"buckets_path": "_count"}},
                "deriv": {"derivative": {"buckets_path": "_count"}},
            },
        }
    })["daily"]
    rows = out.orderBy("key").collect()
    assert len(rows) == 5
    assert rows[0]["deriv"] is None
    assert rows[-1]["cum"] == 60


def test_range_overlapping(spark, frame):
    out = aggs.aggregate(frame, {
        "r": {"range": {"field": "v", "ranges": [
            {"to": 30}, {"from": 20, "to": 50}, {"from": 45},
        ]}}
    })["r"]
    got = rowmap(out)
    assert got["*-30"]["doc_count"] == 30
    assert got["20-50"]["doc_count"] == 30
    assert got["45-*"]["doc_count"] == 15


def test_filters_and_global(spark, frame):
    out = aggs.aggregate(frame, {
        "f": {"filters": {"filters": {
            "low": {"range": {"v": {"lt": 10}}},
            "cat_a": {"term": {"cat": "a"}},
        }}, "aggs": {"mv": {"max": {"field": "v"}}}}
    })["f"]
    got = rowmap(out)
    assert got["low"]["doc_count"] == 10 and got["cat_a"]["mv"] == 57.0
    g = aggs.aggregate(frame, {"g": {"global": {}, "aggs": {"n": {"value_count": {"field": "id"}}}}})["g"]
    assert g.collect()[0]["n"] == 60


def test_top_hits_subagg(spark, frame):
    out = aggs.aggregate(frame, {
        "per_cat": {"terms": {"field": "cat"},
                    "aggs": {"top": {"top_hits": {"size": 2, "sort": [{"v": {"order": "desc"}}]}}}}
    })["per_cat"]
    rows = out.collect()
    assert len(rows) == 6  # 3 cats × 2 hits
    best_a = [r for r in rows if r["key"] == "a" and r["_rank"] == 1][0]
    assert best_a["v"] == 57.0


def test_bucket_script_and_selector(spark, frame):
    out = aggs.aggregate(frame, {
        "cats": {"terms": {"field": "cat"}, "aggs": {
            "sv": {"sum": {"field": "v"}},
            "ratio": {"bucket_script": {
                "buckets_path": {"s": "sv", "c": "doc_count"},
                "script": "params.s / params.c"}},
            "keep": {"bucket_selector": {
                "buckets_path": {"c": "doc_count"},
                "script": "params.c >= 20"}},
        }}
    })["cats"]
    rows = out.collect()
    assert all(r["ratio"] == pytest.approx(r["sv"] / r["doc_count"]) for r in rows)
    assert all(r["doc_count"] >= 20 for r in rows)


def test_moving_fn_and_serial_diff(spark, frame):
    out = aggs.aggregate(frame, {
        "daily": {"date_histogram": {"field": "ts", "calendar_interval": "1d"}, "aggs": {
            "mavg": {"moving_fn": {"buckets_path": "_count", "window": 2,
                                   "script": "MovingFunctions.unweightedAvg(values)"}},
            "sd": {"serial_diff": {"buckets_path": "_count", "lag": 2}},
        }}
    })["daily"]
    rows = out.orderBy("key").collect()
    # MovFnPipelineAggregator.java:112 — window [i-window+shift, i+shift)
    # EXCLUDES the current bucket at shift=0
    assert rows[0]["mavg"] is None
    assert rows[1]["mavg"] == pytest.approx(rows[0]["doc_count"])
    assert rows[2]["mavg"] == pytest.approx((rows[0]["doc_count"] + rows[1]["doc_count"]) / 2)
    assert rows[2]["sd"] == rows[2]["doc_count"] - rows[0]["doc_count"]


def test_rare_terms_adjacency_cardinality(spark, frame):
    rare = aggs.aggregate(frame, {"r": {"rare_terms": {"field": "grp", "max_doc_count": 14}}})["r"]
    assert {r["key"] for r in rare.collect()} == {None, "g0", "g2"}  # 6, 12, 12 docs
    adj = aggs.aggregate(frame, {"adj": {"adjacency_matrix": {"filters": {
        "low": {"range": {"v": {"lt": 30}}}, "a": {"term": {"cat": "a"}}}}}})["adj"]
    got = rowmap(adj)
    assert got["low"]["doc_count"] == 30 and got["low&a"]["doc_count"] == 10
    card = aggs.aggregate(frame, {"c": {"cardinality": {"field": "grp", "precision_threshold": 40000}}})["c"]
    assert card.collect()[0]["c"] == 4


def test_mad_and_weighted_avg(spark, frame):
    mad = aggs.aggregate(frame, {"mad": {"median_absolute_deviation": {"field": "v"}}})["mad"]
    assert mad.collect()[0]["mad"] == pytest.approx(15.0)
    wa = aggs.aggregate(frame, {"w": {"weighted_avg": {"value": {"field": "v"}, "weight": {"field": "id"}}}})["w"]
    exp = sum(i * i for i in range(60)) / sum(range(60))
    assert wa.collect()[0]["w"] == pytest.approx(exp)


def test_significant_terms(spark, frame):
    fg = frame.where(F.col("v") < 20)  # ids 0..19 → grp None,g1,g2,g3,g0 mix
    out = aggs.compile_agg(fg, "sig", {"significant_terms": {"field": "cat", "_background_df": frame, "size": 5}})
    rows = out.collect()
    assert all(r["score"] > 0 for r in rows)


def test_composite_with_after(spark, frame):
    out = aggs.aggregate(frame, {"c": {"composite": {
        "sources": [{"cat": {"terms": {"field": "cat"}}}, {"g": {"terms": {"field": "grp"}}}],
        "size": 3, "after": {"cat": "a", "g": "g1"},
    }}})["c"]
    rows = [(r["cat"], r["g"]) for r in out.collect()]
    assert len(rows) == 3
    assert rows[0] > ("a", "g1")
    assert rows == sorted(rows)


def test_auto_date_histogram(spark, frame):
    out = aggs.aggregate(frame, {"adh": {"auto_date_histogram": {"field": "ts", "buckets": 6}}})["adh"]
    rows = out.collect()
    assert rows[0]["interval"] == "day"
    assert len(rows) == 5


def test_nested_agg(spark):
    rows = [
        (1, [{"who": "ann", "stars": 5}, {"who": "bob", "stars": 3}]),
        (2, [{"who": "ann", "stars": 1}]),
    ]
    df = spark.createDataFrame(rows, "id long, comments array<struct<who:string, stars:int>>")
    out = aggs.aggregate(df, {"n": {"nested": {"path": "comments"}, "aggs": {
        "by_who": {"terms": {"field": "who"}, "aggs": {"avg_stars": {"avg": {"field": "stars"}}}}}}})["n"]
    got = {r["key"]: r for r in out.collect()}
    assert got["ann"]["doc_count"] == 2 and got["ann"]["avg_stars"] == 3.0


def test_percentile_ranks(spark, frame):
    out = aggs.aggregate(frame, {"pr": {"percentile_ranks": {"field": "v", "values": [29.5, 59.0]}}})["pr"]
    row = out.collect()[0]
    assert row["pr.29.5"] == pytest.approx(50.0)  # 30 of 60 values ≤ 29.5
    assert row["pr.59.0"] == pytest.approx(100.0)


def test_percentiles_approximate_mode(spark, frame):
    out = aggs.aggregate(frame, {"p": {"percentiles": {
        "field": "v", "percents": [50], "tdigest": {"compression": 100}}}})["p"]
    assert out.collect()[0]["p.50"] == pytest.approx(29.5, abs=1.0)


def test_date_range_agg(spark, frame):
    out = aggs.aggregate(frame, {"dr": {"date_range": {"field": "ts", "ranges": [
        {"to": "2024-01-03", "key": "early"},
        {"from": "2024-01-03", "key": "late"},
    ]}}})["dr"]
    got = rowmap(out)
    # days 1,2 → 24 docs (i%5 in {0,1}); days 3,4,5 → 36
    assert got["early"]["doc_count"] == 24 and got["late"]["doc_count"] == 36


def test_ip_range_agg(spark, frame):
    df = frame.withColumn("ip", F.format_string("10.0.%d.%d", F.col("id") % 2, F.col("id")))
    out = aggs.aggregate(df, {"ips": {"ip_range": {"field": "ip", "ranges": [
        {"mask": "10.0.0.0/24", "key": "even"},
        {"from": "10.0.1.0", "to": "10.0.2.0", "key": "odd"},
    ]}}})["ips"]
    got = rowmap(out)
    assert got["even"]["doc_count"] == 30 and got["odd"]["doc_count"] == 30


def test_significant_text(spark, frame):
    txt = frame.withColumn(
        "body",
        F.when(F.col("cat") == "a", F.lit("quantum flux and common words"))
        .otherwise(F.lit("plain common words here")),
    )
    fg = txt.where(F.col("cat") == "a")
    out = aggs.compile_agg(fg, "st", {"significant_text": {
        "field": "body", "_background_df": txt, "size": 3, "min_doc_count": 2}})
    keys = [r["key"] for r in out.collect()]
    assert "quantum" in keys and "flux" in keys
    assert "common" not in keys  # equally frequent in bg → no lift


def test_reverse_nested(spark):
    rows = [
        (1, 100.0, [{"who": "ann", "stars": 5}, {"who": "bob", "stars": 3}, {"who": "ann", "stars": 1}]),
        (2, 50.0, [{"who": "ann", "stars": 1}]),
        (3, 10.0, [{"who": "bob", "stars": 4}]),
    ]
    df = spark.createDataFrame(rows, "id long, price double, comments array<struct<who:string, stars:int>>")
    out = aggs.aggregate(df, {"n": {"nested": {"path": "comments"}, "aggs": {
        "by_who": {"terms": {"field": "who"}, "aggs": {
            "avg_stars": {"avg": {"field": "stars"}},
            "back": {"reverse_nested": {}, "aggs": {"avg_price": {"avg": {"field": "price"}}}},
        }}}}})["n"]
    got = rowmap(out)
    # ann: 3 comments across parents 1,2 → rn doc_count 2, avg price 75
    assert got["ann"]["doc_count"] == 3
    assert got["ann"]["back.doc_count"] == 2
    assert got["ann"]["avg_price"] == pytest.approx(75.0)
    # bob: comments in parents 1,3
    assert got["bob"]["back.doc_count"] == 2
    assert got["bob"]["avg_price"] == pytest.approx(55.0)
    assert got["bob"]["avg_stars"] == pytest.approx(3.5)


@pytest.fixture(scope="module")
def geo_frame(spark):
    rows = [
        (1, {"lat": 48.85, "lon": 2.35}),   # Paris
        (2, {"lat": 48.86, "lon": 2.34}),   # Paris-ish
        (3, {"lat": 40.71, "lon": -74.0}),  # NYC
        (4, {"lat": -33.87, "lon": 151.2}), # Sydney
    ]
    return spark.createDataFrame(rows, "id long, loc struct<lat:double,lon:double>").cache()


def test_geo_bounds_and_centroid(spark, geo_frame):
    b = aggs.compile_agg(geo_frame, "vp", {"geo_bounds": {"field": "loc"}}).collect()[0]
    assert b["vp.top"] == 48.86 and b["vp.bottom"] == -33.87
    assert b["vp.left"] == -74.0 and b["vp.right"] == 151.2
    c = aggs.compile_agg(geo_frame, "c", {"geo_centroid": {"field": "loc"}}).collect()[0]
    assert c["c.count"] == 4 and c["c.lat"] == pytest.approx((48.85 + 48.86 + 40.71 - 33.87) / 4)


def test_geotile_and_geohash_grid(spark, geo_frame):
    t = aggs.compile_agg(geo_frame, "g", {"geotile_grid": {"field": "loc", "precision": 6}})
    got = {r["key"]: r["doc_count"] for r in t.collect()}
    assert sum(got.values()) == 4 and max(got.values()) == 2  # both Paris points share a tile
    assert all(k.startswith("6/") for k in got)
    h = aggs.compile_agg(geo_frame, "h", {"geohash_grid": {"field": "loc", "precision": 3}})
    goth = {r["key"]: r["doc_count"] for r in h.collect()}
    assert sum(goth.values()) == 4 and max(goth.values()) == 2
    # known geohash prefixes: Paris u09, NYC dr5, Sydney r3g
    assert {"u09", "dr5", "r3g"} == set(goth)


def test_completion_suggester(spark, tmp_path):
    from elasticsearch_spark.operators.suggest import (
        build_completion_index,
        completion_suggest,
    )

    idx = str(tmp_path / "cidx")
    sugg = spark.createDataFrame(
        [("spark sql", 10), ("spark streaming", 7), ("spark core", 7),
         ("sparse vectors", 3), ("postgres", 1)],
        "suggestion string, weight int",
    )
    build_completion_index(spark, idx, sugg, weight_col="weight")
    got = [(r["suggestion"], r["weight"]) for r in completion_suggest(spark, idx, "spark", size=3).collect()]
    # weight DESC, suggestion ASC tie-break
    assert got == [("spark sql", 10), ("spark core", 7), ("spark streaming", 7)]
    # fuzzy prefix: 'spakr' (transposition) still reaches spark* entries
    fz = {r["suggestion"] for r in completion_suggest(spark, idx, "spakr", size=5, fuzziness=2).collect()}
    assert "spark sql" in fz and "postgres" not in fz


def test_sibling_bucket_pipelines(spark, frame):
    out = aggs.aggregate(frame, {
        "cats": {"terms": {"field": "cat", "size": 10},
                 "aggs": {"sv": {"sum": {"field": "v"}}}},
        "avg_cnt": {"avg_bucket": {"buckets_path": "cats>_count"}},
        "max_sv": {"max_bucket": {"buckets_path": "cats>sv"}},
        "stats_cnt": {"stats_bucket": {"buckets_path": "cats>_count"}},
    })
    assert out["avg_cnt"].collect()[0]["avg_cnt"] == pytest.approx(20.0)
    # cat 'a': ids 0,3,...,57 → sum = 3*(0+1+...+19) = 570; 'b' sums 590; 'c' 610
    assert out["max_sv"].collect()[0]["max_sv"] == pytest.approx(610.0)
    st = out["stats_cnt"].collect()[0]
    assert st["stats_cnt.count"] == 3 and st["stats_cnt.sum"] == 60


def test_diversified_sampler(spark, frame):
    out = aggs.compile_agg(frame, "ds", {"diversified_sampler": {
        "field": "cat", "max_docs_per_value": 2, "shard_size": 100},
        "aggs": {"n": {"value_count": {"field": "id"}}}})
    assert out.collect()[0]["n"] == 6  # 3 cats × 2 docs each


def test_scripted_metric(spark, frame):
    out = aggs.aggregate(frame, {"sm": {"scripted_metric": {
        "map_script": "CASE WHEN cat = 'a' THEN v * 2 ELSE 0 END",
        "reduce_script": "sum(states)"}}})["sm"]
    exp = sum(i * 2 for i in range(60) if i % 3 == 0)
    assert out.collect()[0]["sm"] == exp


def test_multi_terms(spark, frame):
    out = aggs.compile_agg(frame, "mt", {
        "multi_terms": {"terms": [{"field": "cat"}, {"field": "grp"}], "size": 5},
        "aggs": {"avg_v": {"avg": {"field": "v"}}},
    })
    rows = out.collect()
    assert rows[0]["key"].count("|") == 1
    assert [r["doc_count"] for r in rows] == sorted(
        [r["doc_count"] for r in rows], reverse=True
    )


def test_ip_prefix(spark):
    df = spark.createDataFrame(
        [("10.1.17.4",), ("10.1.18.200",), ("10.1.32.1",)], "ip string"
    )
    out = aggs.compile_agg(df, "nets", {"ip_prefix": {"field": "ip", "prefix_length": 20}})
    got = rowmap(out)
    # /20 keeps the top 4 bits of octet 3: 17,18 → 16; 32 → 32
    assert got == {
        "10.1.16.0": {"key": "10.1.16.0", "doc_count": 2},
        "10.1.32.0": {"key": "10.1.32.0", "doc_count": 1},
    }


def test_string_stats_entropy(spark):
    df = spark.createDataFrame([("aabb",), ("ab",)], "s string")
    out = aggs.compile_agg(df, "ss", {"string_stats": {"field": "s"}}).collect()[0]
    # chars: a×3, b×3 → uniform over 2 symbols → entropy exactly 1 bit
    assert out["count"] == 2 and out["min_length"] == 2 and out["max_length"] == 4
    assert abs(out["entropy"] - 1.0) < 1e-9


def test_boxplot_whiskers(spark):
    vals = [float(x) for x in [1, 2, 3, 4, 5, 6, 7, 8, 100]]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = aggs.compile_agg(df, "bp", {"boxplot": {"field": "v"}}).collect()[0]
    assert out["min"] == 1.0 and out["max"] == 100.0
    assert out["q2"] == 5.0
    # 100 is outside the 1.5·IQR fence → upper whisker snaps to 8
    assert out["upper"] == 8.0 and out["lower"] == 1.0


def test_matrix_stats_correlation(spark):
    df = spark.createDataFrame(
        [(float(i), 2.0 * i + 1.0) for i in range(10)], "x double, y double"
    )
    out = aggs.compile_agg(df, "ms", {"matrix_stats": {"fields": ["x", "y"]}})
    got = {(r["field_x"], r["field_y"]): r.asDict() for r in out.collect()}
    assert got[("x", "y")]["correlation"] == 1.0  # exactly linear
    assert got[("x", "x")]["variance_x"] == got[("x", "y")]["covariance"] / 2.0
    assert abs(got[("x", "x")]["skewness_x"]) < 1e-6  # symmetric


def test_variable_width_histogram(spark, frame):
    out = aggs.compile_agg(frame, "vw", {
        "variable_width_histogram": {"field": "v", "buckets": 4}
    }).collect()
    assert len(out) == 4
    assert sum(r["doc_count"] for r in out) == 60
    # buckets ordered and non-overlapping
    for a, b in zip(out, out[1:]):
        assert a["max"] <= b["min"]


def test_normalize_methods(spark, frame):
    out = aggs.aggregate(frame, {
        "cats": {"terms": {"field": "cat", "size": 3},
                 "aggs": {"pct": {"normalize": {"buckets_path": "_count",
                                                "method": "percent_of_sum"}},
                          "sm": {"normalize": {"buckets_path": "_count",
                                               "method": "softmax"}}}},
    })["cats"]
    rows = out.collect()
    assert abs(sum(r["pct"] for r in rows) - 100.0) < 1e-6
    assert abs(sum(r["sm"] for r in rows) - 1.0) < 1e-4


def test_moving_percentiles(spark, frame):
    out = aggs.aggregate(frame, {
        "daily": {"date_histogram": {"field": "ts", "calendar_interval": "1d"},
                  "aggs": {"sv": {"sum": {"field": "v"}},
                           "mp": {"moving_percentiles": {"buckets_path": "sv",
                                                         "window": 3,
                                                         "percents": [50]}}}},
    })["daily"]
    rows = out.orderBy("key").collect()
    svs = [r["sv"] for r in rows]
    import statistics

    for i, r in enumerate(rows):
        # MovingPercentilesPipelineAggregator.java:89 — the window
        # [i-window+shift, i+shift) excludes the current bucket at shift=0
        window = svs[max(0, i - 3): i]
        if not window:
            assert r["mp.50"] is None
        else:
            assert abs(r["mp.50"] - statistics.median(window)) < 1e-9


def test_tdigest_accuracy_and_determinism(spark):
    import numpy as np

    from elasticsearch_spark.functions import tdigest as td

    rng = np.random.Generator(np.random.Philox(7))
    vals = rng.lognormal(0.0, 1.0, 50_000)
    df = spark.createDataFrame([(float(v),) for v in vals], "v double").repartition(8)
    spec = {"percentiles": {"field": "v", "method": "tdigest",
                            "percents": [1, 50, 95, 99, 99.9]}}
    out1 = aggs.compile_agg(df, "ps", spec).collect()[0].asDict()
    out2 = aggs.compile_agg(df, "ps", spec).collect()[0].asDict()
    assert out1 == out2  # deterministic for a fixed partitioning
    # t-digest's contract is bounded RANK error (tails tighter than mid —
    # the k1 scale function's property); value error is unbounded on heavy
    # tails, so assert the rank of each estimate against the empirical CDF
    svals = np.sort(vals)
    for p in [1, 50, 95, 99, 99.9]:
        got = out1[f"ps.{p}"]
        rank = 100.0 * np.searchsorted(svals, got) / len(svals)
        tol = 0.15 if p in (1, 99, 99.9) else 0.5
        assert abs(rank - p) < tol, (p, got, rank)
    # the SKETCH must actually run (guards the dispatch: method=tdigest must
    # not fall through to the exact-percentile metric path)
    spark_exact = aggs.compile_agg(df, "ps", {
        "percentiles": {"field": "v", "percents": [1, 50, 95, 99, 99.9]}
    }).collect()[0].asDict()
    assert any(out1[f"ps.{p}"] != spark_exact[f"ps.{p}"] for p in [1, 50, 95, 99, 99.9])
    # digest is actually compressed: centroid count ≲ 2·compression
    m, w, mn, mx = td.from_values(vals, 100.0)
    assert len(m) < 250
    assert abs(w.sum() - len(vals)) < 1e-6
    assert mn == vals.min() and mx == vals.max()


def test_tdigest_merge_equals_single(spark):
    import numpy as np

    from elasticsearch_spark.functions import tdigest as td

    rng = np.random.Generator(np.random.Philox(9))
    vals = rng.normal(100.0, 15.0, 20_000)
    parts = np.array_split(vals, 7)
    merged = td.merge([td.from_values(p, 100.0) for p in parts], 100.0)
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        got = td.quantile(merged[0], merged[1], q, merged[2], merged[3])
        exact = float(np.quantile(vals, q))
        assert abs(got - exact) < 0.5, (q, got, exact)


def test_significance_heuristics(spark):
    """All five heuristics on a hand-computable 2×2 contingency:
    fg = 10 docs (8 contain 'x'); bg = 100 docs (20 contain 'x')."""
    import math

    rows = []
    for i in range(100):
        in_fg = i < 10
        has_x = (i < 8) or (10 <= i < 22)  # fg: 8 of 10; bg total: 20
        rows.append((i, in_fg, "x" if has_x else "y"))
    df = spark.createDataFrame(rows, "id long, fg boolean, term string")
    fg = df.where("fg")

    def score(heuristic, params=None):
        out = aggs.compile_agg(fg, "s", {
            "significant_terms": {"field": "term", "size": 10,
                                  heuristic: params or {},
                                  "_background_df": df},
        }).collect()
        return {r["key"]: r["score"] for r in out}

    n11, n_1, n1_, n = 8.0, 10.0, 20.0, 100.0
    n01, n10 = n_1 - n11, n1_ - n11
    n00, n0_, n_0 = n - n1_ - n01, n - n1_, n - n_1
    # chi_square (ChiSquare.java)
    exp_chi = n * (n11 * n00 - n01 * n10) ** 2 / (n_1 * n1_ * n0_ * n_0)
    assert score("chi_square")["x"] == pytest.approx(exp_chi, rel=1e-9)
    # gnd (GND.java)
    exp_gnd = math.exp(
        -(max(math.log(n1_), math.log(n_1)) - math.log(n11))
        / (math.log(n) - min(math.log(n1_), math.log(n_1)))
    )
    assert score("gnd")["x"] == pytest.approx(exp_gnd, rel=1e-9)
    # mutual_information (MutualInformation.java)
    def mi_t(nxy, nx_, n_y):
        return 0.0 if nxy <= 0 else nxy / n * math.log(n * nxy / (nx_ * n_y))
    exp_mi = (mi_t(n00, n0_, n_0) + mi_t(n01, n0_, n_1)
              + mi_t(n10, n1_, n_0) + mi_t(n11, n1_, n_1)) / math.log(2)
    assert score("mutual_information")["x"] == pytest.approx(exp_mi, rel=1e-9)
    # percentage (PercentageScore.java)
    assert score("percentage")["x"] == pytest.approx(n11 / n1_, rel=1e-9)
    # include_negatives=False drops under-represented terms ('y': 2/10 < bg)
    got = score("chi_square", {"include_negatives": False})
    assert "y" not in got
