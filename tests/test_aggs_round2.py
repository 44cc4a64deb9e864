"""Round-2 agg/query surface: t_test, children/parent, categorize_text,
geo_line, frequent_item_sets, pinned query, phonetic token filter."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.plans.aggs import aggregate


# ---------------------------------------------------------------------------
# t_test
# ---------------------------------------------------------------------------

def _welch(a, b):
    na, nb = len(a), len(b)
    ma, mb = sum(a) / na, sum(b) / nb
    va = sum((x - ma) ** 2 for x in a) / (na - 1)
    vb = sum((x - mb) ** 2 for x in b) / (nb - 1)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    dof = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    return t, dof


def test_t_test_heteroscedastic(spark):
    a = [3.1, 2.9, 3.4, 3.0, 3.3, 2.8, 3.2]
    b = [2.5, 2.7, 2.2, 2.6, 2.4, 2.8]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "grp string, v double")
    out = aggregate(df, {"tt": {"t_test": {
        "a": {"field": "v", "filter": {"term": {"grp": "a"}}},
        "b": {"field": "v", "filter": {"term": {"grp": "b"}}},
        "type": "heteroscedastic"}}})["tt"].collect()[0]
    t, dof = _welch(a, b)
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert abs(out["t_stat"] - t) < 1e-10
    assert abs(out["dof"] - dof) < 1e-9
    assert 0.0 < out["p_value"] < 0.001  # clearly separated means


def test_t_test_paired_and_pooled(spark):
    pairs = [(3.0, 2.4), (3.2, 2.6), (2.9, 2.5), (3.4, 2.7), (3.1, 2.9)]
    df = spark.createDataFrame(pairs, "x double, y double")
    out = aggregate(df, {"tt": {"t_test": {
        "a": {"field": "x"}, "b": {"field": "y"}, "type": "paired"}}})["tt"].collect()[0]
    d = [x - y for x, y in pairs]
    md = sum(d) / len(d)
    vd = sum((v - md) ** 2 for v in d) / (len(d) - 1)
    t = md / math.sqrt(vd / len(d))
    assert abs(out["t_stat"] - t) < 1e-10
    assert out["dof"] == len(d) - 1

    out2 = aggregate(df.selectExpr("x as v", "'a' as grp").union(
        df.selectExpr("y as v", "'b' as grp")
    ), {"tt": {"t_test": {
        "a": {"field": "v", "filter": {"term": {"grp": "a"}}},
        "b": {"field": "v", "filter": {"term": {"grp": "b"}}},
        "type": "homoscedastic"}}})["tt"].collect()[0]
    assert out2["dof"] == 2 * len(pairs) - 2


def test_t_p_value_reference_points():
    # hand-checked Student-t tail values (standard tables)
    from elasticsearch_spark.functions.stats import t_two_sided_p

    assert abs(t_two_sided_p(2.086, 20) - 0.05) < 2e-3   # t_{0.975,20} ≈ 2.086
    assert abs(t_two_sided_p(1.96, 1e6) - 0.05) < 1e-3   # → normal limit
    assert abs(t_two_sided_p(0.0, 5) - 1.0) < 1e-12


# ---------------------------------------------------------------------------
# children / parent
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def family(spark):
    rows = [
        # (id, join_type, parent_id, color, qty)
        (1, "order", None, "red", None),
        (2, "order", None, "blue", None),
        (3, "order", None, "red", None),
        (101, "line", 1, None, 10.0),
        (102, "line", 1, None, 20.0),
        (201, "line", 2, None, 30.0),
    ]
    return spark.createDataFrame(
        rows, "id long, join_type string, parent_id long, color string, qty double"
    )


def test_children_agg_inherits_parent_attrs(family):
    out = aggregate(family, {"c": {"children": {"type": "line"}, "aggs": {
        "by_color": {"terms": {"field": "color", "size": 10},
                     "aggs": {"aq": {"avg": {"field": "qty"}}}}}}})["c"].collect()
    got = {r["key"]: (r["doc_count"], r["aq"]) for r in out}
    assert got == {"red": (2, 15.0), "blue": (1, 30.0)}


def test_parent_agg_distinct_parents(family):
    out = aggregate(family, {"p": {"parent": {"type": "line"}}})["p"].collect()
    assert out[0]["doc_count"] == 2  # order 3 has no children


# ---------------------------------------------------------------------------
# categorize_text
# ---------------------------------------------------------------------------

def test_categorize_text_groups_by_digitless_pattern(spark):
    msgs = [
        "Connection refused to host 10.0.0.1 port 8080",
        "Connection refused to host 10.0.0.2 port 9090",
        "Connection refused to host db7 port 5432",
        "User 4312 logged in",
        "User 99 logged in",
        "startup complete",
    ]
    df = spark.createDataFrame([(i, m) for i, m in enumerate(msgs)], "id long, msg string")
    out = aggregate(df, {"cat": {"categorize_text": {"field": "msg", "size": 10}}})["cat"].collect()
    got = {r["key"]: r["doc_count"] for r in out}
    assert got["connection refused to host port"] == 3
    assert got["user logged in"] == 2
    assert got["startup complete"] == 1


# ---------------------------------------------------------------------------
# geo_line
# ---------------------------------------------------------------------------

def test_geo_line_orders_by_sort_field_and_truncates(spark):
    rows = [
        ("t1", 3, 30.0, 3.0), ("t1", 1, 10.0, 1.0), ("t1", 2, 20.0, 2.0),
        ("t2", 1, -5.0, 5.0),
    ]
    df = spark.createDataFrame(rows, "track string, ts int, lon double, lat double")
    out = aggregate(df, {"l": {
        "terms": {"field": "track", "size": 10, "order": {"_key": "asc"}},
        "aggs": {"line": {"geo_line": {
            "lon_field": "lon", "lat_field": "lat", "sort": {"field": "ts"}}}},
    }})["l"].collect()
    by = {r["key"]: r["line"] for r in out}
    assert by["t1"] == [[10.0, 1.0], [20.0, 2.0], [30.0, 3.0]]
    assert by["t2"] == [[-5.0, 5.0]]

    trunc = aggregate(df.where(F.col("track") == "t1"), {"l": {"geo_line": {
        "lon_field": "lon", "lat_field": "lat", "sort": {"field": "ts"},
        "size": 2, "sort_order": "desc"}}})["l"].collect()[0]["l"]
    assert trunc == [[30.0, 3.0], [20.0, 2.0]]


# ---------------------------------------------------------------------------
# frequent_item_sets
# ---------------------------------------------------------------------------

def test_frequent_item_sets_closed_sets_and_triples(spark):
    # a,b always co-occur (so {a} and {b} are NOT closed; {a,b} is);
    # c appears alone once as well (so {c} IS closed).
    tx = [
        (1, "a", "b", "c"), (2, "a", "b", "c"), (3, "a", "b", "c"),
        (4, "a", "b", None), (5, None, None, "c"),
    ]
    df = spark.createDataFrame(tx, "id long, f1 string, f2 string, f3 string")
    out = aggregate(df, {"fis": {"frequent_item_sets": {
        "fields": ["f1", "f2", "f3"], "minimum_support": 0.2,
        "minimum_set_size": 1, "size": 20}}})["fis"].collect()
    got = {r["key"]: (r["set_size"], r["doc_count"]) for r in out}
    # closed sets only
    assert "f1=a" not in got and "f2=b" not in got      # absorbed by {a,b}
    assert got["f1=a,f2=b"] == (2, 4)
    assert got["f3=c"] == (1, 4)                          # c alone in tx 5
    assert got["f1=a,f2=b,f3=c"] == (3, 3)                # triple level works
    # {a,c} and {b,c} (count 3) are absorbed by the equal-count triple
    assert "f1=a,f3=c" not in got and "f2=b,f3=c" not in got


def test_frequent_item_sets_support_threshold(spark):
    tx = [(1, "x"), (2, "x"), (3, "x"), (4, "y")]
    df = spark.createDataFrame(tx, "id long, f string")
    out = aggregate(df, {"fis": {"frequent_item_sets": {
        "fields": ["f"], "minimum_support": 0.5, "size": 10}}})["fis"].collect()
    assert [r["key"] for r in out] == ["f=x"]
    assert abs(out[0]["support"] - 0.75) < 1e-12


# ---------------------------------------------------------------------------
# pinned query
# ---------------------------------------------------------------------------

def test_pinned_query_order_and_organic(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [(i, 100.0 + i) for i in range(1, 8)], "id long, price double"
    )
    node = dsl.parse({"pinned": {
        "ids": [5, 2, 999],  # 999 doesn't exist → skipped
        "organic": {"constant_score": {
            "filter": {"range": {"price": {"gte": 105.0}}}, "boost": 2.0}},
    }})
    ctx = dsl.SearchContext(df, "id")
    rows = node.frame(ctx).orderBy(F.desc("_score"), F.asc("__key")).collect()
    ids = [r["__key"] for r in rows]
    assert ids[:2] == [5, 2]                       # pins first, list order
    assert set(ids[2:]) == {6, 7}                  # organic minus pinned-5
    assert rows[0]["_score"] > rows[1]["_score"] > rows[2]["_score"]
    # predicate form: pins OR organic
    assert df.where(node.predicate(ctx)).count() == 4  # {5,2} ∪ {5,6,7}


# ---------------------------------------------------------------------------
# phonetic token filter
# ---------------------------------------------------------------------------

def test_soundex_published_values():
    from elasticsearch_spark.functions.analysis import _soundex

    # the canonical published Soundex examples
    for w, code in [
        ("Robert", "R163"), ("Rupert", "R163"), ("Ashcraft", "A261"),
        ("Ashcroft", "A261"), ("Tymczak", "T522"), ("Pfister", "P236"),
        ("Honeyman", "H555"), ("Jackson", "J250"),
    ]:
        assert _soundex(w) == code, w


def test_metaphone_examples():
    from elasticsearch_spark.functions.analysis import _metaphone

    for w, code in [
        ("metaphone", "MTFN"), ("Knight", "NT"), ("Philip", "FLP"),
        ("science", "SNS"), ("school", "SKL"), ("phone", "FN"),
        ("Wright", "RT"), ("Xavier", "SFR"), ("quick", "KK"),
    ]:
        assert _metaphone(w) == code, (w, _metaphone(w))


def test_phonetic_filter_modes(spark):
    from elasticsearch_spark.functions.analysis import _filter_phonetic

    assert _filter_phonetic(["smith", "smyth"], encoder="soundex") == ["S530", "S530"]
    # inject mode keeps originals
    assert _filter_phonetic(["smith"], encoder="metaphone", replace=False) == ["smith", "SM0"]


def test_phonetic_analyzer_end_to_end(spark):
    from elasticsearch_spark.functions import analysis

    analysis.register_analyzer(
        "sounds", tokenizer="standard",
        filters=[{"type": "phonetic", "encoder": "soundex"}],
    )
    assert analysis.analyze("Smith Smyth", "sounds") == ["S530", "S530"]


# ---------------------------------------------------------------------------
# multi_match phrase / phrase_prefix / bool_prefix + search_as_you_type
# ---------------------------------------------------------------------------

def test_multi_match_bool_prefix_shingle_subfields(spark):
    from elasticsearch_spark.plans import dsl

    docs = [
        (1, "quick brown fox jumps"),
        (2, "brown quick dog"),
        (3, "quick brownie recipe"),
        (4, "nothing relevant here"),
    ]
    df = spark.createDataFrame(docs, "id long, title string")
    # search_as_you_type query shape: bool_prefix over base + shingle subfields
    node = dsl.parse({"multi_match": {
        "query": "quick brown fo",
        "type": "bool_prefix",
        "fields": ["title", "title._2gram", "title._3gram"],
    }})
    ctx = dsl.SearchContext(df, "id", text_col="title")
    rows = {r["__key"]: r["_score"] for r in node.frame(ctx).collect()}
    # doc 1 matches the base terms AND the 2gram "quick brown" AND the
    # 3gram prefix "quick brown fo..." -> highest score
    assert max(rows, key=rows.get) == 1
    assert 4 not in rows
    # doc 3 ("quick brownie") matches base quick + prefix bro... on 2gram
    assert 3 in rows and rows[1] > rows[3]


def test_shingle_context_tokens(spark):
    from elasticsearch_spark.plans.dsl import SearchContext

    df = spark.createDataFrame([(1, "a b c d")], "id long, title string")
    ctx2 = SearchContext(df, "id", text_col="title", shingle=2)
    toks = df.select(ctx2.toks_col().alias("t")).collect()[0]["t"]
    assert toks == ["a b", "b c", "c d"]
    assert ctx2.analyze("a b c") == ["a b", "b c"]
    # shorter than the shingle size -> empty
    ctx3 = SearchContext(df, "id", text_col="title", shingle=5)
    assert df.select(ctx3.toks_col().alias("t")).collect()[0]["t"] == []


def test_multi_match_phrase_types(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [(1, "big data engine", "x"), (2, "data big engine", "big data here")],
        "id long, a string, b string",
    )
    ph = dsl.parse({"multi_match": {"query": "big data", "type": "phrase",
                                    "fields": ["a", "b"]}})
    ctx = dsl.SearchContext(df, "id", text_col="a")
    assert {r["__key"] for r in ph.frame(ctx).collect()} == {1, 2}
    pp = dsl.parse({"multi_match": {"query": "big dat", "type": "phrase_prefix",
                                    "fields": ["a", "b"]}})
    assert {r["__key"] for r in pp.frame(ctx).collect()} == {1, 2}


def test_date_histogram_time_zone_and_offset(spark):
    from pyspark.sql import functions as F

    from elasticsearch_spark.plans.aggs import aggregate

    # 2024-01-01 23:30 UTC = 2024-01-02 00:30 in +01:00 → local-day bucket
    df = spark.createDataFrame(
        [("2024-01-01 23:30:00",), ("2024-01-01 10:00:00",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = aggregate(df, {"d": {"date_histogram": {
        "field": "ts", "calendar_interval": "1d", "time_zone": "+01:00",
    }}})["d"].orderBy("key").collect()
    assert [str(r.key) for r in out] == [
        "2023-12-31 23:00:00", "2024-01-01 23:00:00"]
    assert [r.doc_count for r in out] == [1, 1]
    # offset +6h: the day bucket starts at 06:00 — a 05:00 doc belongs to
    # the PREVIOUS day's offset bucket
    df2 = spark.createDataFrame(
        [("2024-01-02 05:00:00",), ("2024-01-02 07:00:00",)], "ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out2 = aggregate(df2, {"d": {"date_histogram": {
        "field": "ts", "calendar_interval": "1d", "offset": "+6h",
    }}})["d"].orderBy("key").collect()
    assert [str(r.key) for r in out2] == [
        "2024-01-01 06:00:00", "2024-01-02 06:00:00"]


def test_change_point_agg(spark):
    from pyspark.sql import functions as F

    from elasticsearch_spark.plans.aggs import aggregate

    def run(vals):
        rows = [(float(i), float(v)) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "b double, v double")
        out = aggregate(df, {
            "h": {"histogram": {"field": "b", "interval": 1},
                  "aggs": {"m": {"avg": {"field": "v"}}}},
            "cp": {"change_point": {"buckets_path": "h>m"}},
        })["cp"].collect()[0]
        return out

    # clean step change at index 10
    step = run([1.0] * 10 + [9.0] * 10)
    assert step.type == "step_change"
    assert step.key == "10"
    assert step.p_value < 0.01
    # single spike
    spike = run([2.0] * 9 + [50.0] + [2.0] * 10)
    assert spike.type == "spike" and spike.key == "9"
    # stationary noise-free flat series
    flat = run([3.0] * 20)
    assert flat.type == "stationary"


def test_missing_param_terms_and_metric(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), ("b", None)],
        "lang string, v double",
    )
    out = aggregate(df, {"t": {
        "terms": {"field": "lang", "missing": "N/A", "size": 10},
        "aggs": {"s": {"sum": {"field": "v", "missing": 0.0}}},
    }})["t"].collect()
    got = {r.key: (r.doc_count, r.s) for r in out}
    assert got == {"a": (1, 1.0), "N/A": (1, 2.0), "b": (1, 0.0)}


def test_esql_sample(spark):
    from elasticsearch_spark.plans.esql import esql

    df = spark.createDataFrame([(i,) for i in range(1000)], "id long")
    out = esql(spark, "FROM t | SAMPLE 0.2", {"t": df})
    n = out.count()
    assert 120 < n < 290
    # seeded: two runs agree
    assert esql(spark, "FROM t | SAMPLE 0.2", {"t": df}).count() == n


def test_filters_other_bucket(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame(
        [("en", 1), ("de", 2), ("fr", 3), ("fr", 4)], "lang string, v long"
    )
    out = aggregate(df, {"f": {"filters": {
        "filters": {"english": {"term": {"lang": "en"}},
                    "german": {"term": {"lang": "de"}}},
        "other_bucket": True,
    }}})["f"].collect()
    got = {r.key: r.doc_count for r in out}
    assert got == {"english": 1, "german": 1, "_other_": 2}


def test_knn_similarity_threshold(spark):
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.7, 0.7]), (3, [0.0, 1.0])],
        "doc_id long, vec array<double>",
    )
    out = dsl.search(spark, df, {"knn": {
        "field": "vec", "query_vector": [1.0, 0.0], "k": 3, "similarity": 0.9,
    }, "size": 10}).collect()
    assert [r.doc_id for r in out] == [1]


def test_significant_terms_background_filter(spark):
    from elasticsearch_spark.plans.aggs import compile_agg

    # fg = english docs; background narrowed to source s1 only
    df = spark.createDataFrame(
        [
            ("en", "s1", "x"), ("en", "s1", "y"), ("de", "s1", "z"),
            ("de", "s2", "x"), ("de", "s2", "x"),
        ],
        "lang string, source string, term string",
    )
    fg = df.where("lang = 'en'")
    out = compile_agg(fg, "sig", {"significant_terms": {
        "field": "term", "size": 10, "_background_df": df,
        "background_filter": {"term": {"source": "s1"}},
    }})
    got = {r.key: r.bg_count for r in out.collect()}
    # with the filter, x's bg count is 1 (the s2 x's are excluded; it
    # would be 3 against the unfiltered background)
    assert got["x"] == 1


def test_terms_include_exclude_and_partition(spark):
    from elasticsearch_spark.plans import aggs as aggs_mod

    df = spark.createDataFrame(
        [(i, f"src{i % 5}") for i in range(100)], "id long, source string"
    )
    inc = aggs_mod.compile_agg(df, "t", {"terms": {"field": "source", "include": "src[0-2]", "size": 10}})
    assert {r["key"] for r in inc.collect()} == {"src0", "src1", "src2"}
    exc = aggs_mod.compile_agg(df, "t", {"terms": {"field": "source", "exclude": ["src0", "src4"], "size": 10}})
    assert {r["key"] for r in exc.collect()} == {"src1", "src2", "src3"}
    lst = aggs_mod.compile_agg(df, "t", {"terms": {"field": "source", "include": ["src3"], "size": 10}})
    assert [r["key"] for r in lst.collect()] == ["src3"]
    # partitioning: the two partitions are disjoint and exhaustive
    parts = [
        {r["key"] for r in aggs_mod.compile_agg(
            df, "t", {"terms": {"field": "source", "size": 10,
                                "include": {"partition": p, "num_partitions": 2}}}
        ).collect()}
        for p in (0, 1)
    ]
    assert parts[0] & parts[1] == set()
    assert parts[0] | parts[1] == {f"src{i}" for i in range(5)}


def test_histogram_min_doc_count_zero_fills_gaps(spark):
    from elasticsearch_spark.plans import aggs as aggs_mod

    df = spark.createDataFrame([(0.0,), (1.0,), (25.0,)], "v double")
    out = aggs_mod.compile_agg(
        df, "h", {"histogram": {"field": "v", "interval": 10, "min_doc_count": 0}}
    ).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [(0.0, 2), (10.0, 0), (20.0, 1)]


def test_histogram_extended_bounds(spark):
    from elasticsearch_spark.plans import aggs as aggs_mod

    df = spark.createDataFrame([(15.0,)], "v double")
    out = aggs_mod.compile_agg(
        df, "h", {"histogram": {"field": "v", "interval": 10, "min_doc_count": 0,
                                "extended_bounds": {"min": 0, "max": 35}}}
    ).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [
        (0.0, 0), (10.0, 1), (20.0, 0), (30.0, 0)]


def test_date_histogram_min_doc_count_zero(spark):
    from elasticsearch_spark.plans import aggs as aggs_mod

    df = spark.createDataFrame(
        [("2024-01-01 05:00:00",), ("2024-01-04 07:00:00",)], "tss string"
    ).selectExpr("cast(tss as timestamp) AS ts")
    out = aggs_mod.compile_agg(
        df, "h",
        {"date_histogram": {"field": "ts", "calendar_interval": "1d", "min_doc_count": 0}},
    ).collect()
    days = [(str(r["key"])[:10], r["doc_count"]) for r in out]
    assert days == [("2024-01-01", 1), ("2024-01-02", 0), ("2024-01-03", 0), ("2024-01-04", 1)]


def test_terms_two_phase_error_bounds(spark):
    """Hand-built shard layout: shard 0 withholds term 'c' (below its local
    top-2), so the merged bucket for 'c' carries shard 0's last-reported
    count as its error upper bound; exhaustive shards contribute 0."""
    from elasticsearch_spark.plans.aggs import terms_two_phase

    rows = []
    # shard 0: a x5, b x3, c x2  (shard_size=2 -> reports a,b; last c=3)
    rows += [(0, "a")] * 5 + [(0, "b")] * 3 + [(0, "c")] * 2
    # shard 1: c x4, a x1        (2 distinct <= shard_size -> exhaustive, err 0)
    rows += [(1, "c")] * 4 + [(1, "a")]
    df = spark.createDataFrame(rows, "shard int, term string")
    out = {r["key"]: r.asDict() for r in
           terms_two_phase(df, "term", "shard", size=3, shard_size=2).collect()}
    # a: both shards report -> 6, error 0
    assert out["a"]["doc_count"] == 6
    assert out["a"]["doc_count_error_upper_bound"] == 0
    # b: only shard 0 reports (3); shard 1 exhaustive -> error 0
    assert out["b"]["doc_count"] == 3
    assert out["b"]["doc_count_error_upper_bound"] == 0
    # c: only shard 1 reports (4); shard 0 truncated with last count 3
    assert out["c"]["doc_count"] == 4
    assert out["c"]["doc_count_error_upper_bound"] == 3
    # true c count is 6 -> within the bound (4 <= 6 <= 4 + 3)
    assert out["__other__"]["doc_count"] == 2  # 15 total - 13 in top buckets


# --- aggs.py review regression batch -----------------------------------------

def test_nested_multiple_metric_subaggs(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame(
        [(1, [{"p": 2.0, "q": 10.0}, {"p": 4.0, "q": 20.0}]),
         (2, [{"p": 6.0, "q": 30.0}])],
        "id long, items array<struct<p:double,q:double>>",
    )
    out = aggregate(df, {"n": {
        "nested": {"path": "items"},
        "aggs": {"a": {"avg": {"field": "p"}}, "b": {"sum": {"field": "q"}}},
    }})["n"].collect()[0]
    assert out["a"] == 4.0          # (2+4+6)/3
    assert out["b"] == 60.0         # second sub-agg no longer dropped


def test_top_hits_with_sibling_metric(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0)], "k string, v double")
    out = aggregate(df, {"g": {
        "terms": {"field": "k"},
        "aggs": {"th": {"top_hits": {"size": 1, "sort": [{"v": "desc"}]}},
                 "m": {"avg": {"field": "v"}}},
    }})["g"].collect()
    by = {(r["key"], r["_rank"]): r for r in out}
    assert by[("a", 1)]["v"] == 3.0         # top hit
    assert by[("a", 1)]["m"] == 2.0         # sibling avg joined back
    assert by[("b", 1)]["m"] == 5.0


def test_histogram_min_doc_count_prunes(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (12.0,)], "v double")
    out = aggregate(df, {"h": {
        "histogram": {"field": "v", "interval": 10, "min_doc_count": 2}}})["h"].collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [(0.0, 2)]


def test_date_histogram_extended_bounds_strings(spark):
    from pyspark.sql import functions as F

    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame([("2024-01-05",)], "ts string") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    out = aggregate(df, {"h": {"date_histogram": {
        "field": "ts", "calendar_interval": "1d", "min_doc_count": 0,
        "extended_bounds": {"min": "2024-01-03", "max": "2024-01-07"},
    }}})["h"].collect()
    assert len(out) == 5  # Jan 3..7 filled
    assert sum(r["doc_count"] for r in out) == 1


def test_min_doc_count_zero_fill_with_dotted_metrics(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame([(1.0, 5.0), (21.0, 7.0)], "v double, w double")
    out = aggregate(df, {"h": {
        "histogram": {"field": "v", "interval": 10, "min_doc_count": 0},
        "aggs": {"s": {"stats": {"field": "w"}}},
    }})["h"].collect()
    assert len(out) == 3  # 0,10,20 with the 10 bucket filled
    mid = [r for r in out if r["key"] == 10.0][0]
    assert mid["doc_count"] == 0


def test_multi_terms_dotted_metric(spark):
    from elasticsearch_spark.plans.aggs import compile_agg

    df = spark.createDataFrame(
        [("a", "x", 1.0), ("a", "x", 3.0)], "k1 string, k2 string, v double")
    out = compile_agg(df, "mt", {
        "multi_terms": {"terms": [{"field": "k1"}, {"field": "k2"}]},
        "aggs": {"p": {"percentiles": {"field": "v", "percents": [50]}}},
    }).collect()[0]
    assert out["p.50"] == 2.0


def test_terms_order_by_dotted_metric(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 9.0)], "k string, v double")
    out = aggregate(df, {"g": {
        "terms": {"field": "k", "order": {"s.avg": "desc"}},
        "aggs": {"s": {"stats": {"field": "v"}}},
    }})["g"].collect()
    assert [r["key"] for r in out] == ["b", "a"]


def test_bucket_script_shared_prefix_params(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame([("a", 2.0), ("a", 4.0), ("b", 8.0)], "k string, v double")
    out = aggregate(df, {"g": {
        "terms": {"field": "k"},
        "aggs": {
            "total": {"sum": {"field": "v"}},
            "total2": {"avg": {"field": "v"}},
            "ratio": {"bucket_script": {
                "buckets_path": {"t": "total", "t2": "total2"},
                "script": "params.t2 / params.t",
            }},
        },
    }})["g"].collect()
    by = {r["key"]: r["ratio"] for r in out}
    assert by["a"] == 0.5   # avg 3 / sum 6
    assert by["b"] == 1.0


def test_empty_frame_aggs_no_crash(spark):
    from pyspark.sql import functions as F

    from elasticsearch_spark.plans.aggs import aggregate

    empty = spark.createDataFrame([], "ts timestamp, v double, w double")
    out = aggregate(empty, {"a": {"auto_date_histogram": {"field": "ts"}}})["a"]
    assert out.count() == 0
    bx = aggregate(empty, {"b": {"boxplot": {"field": "v"}}})["b"].collect()[0]
    assert bx["min"] is None
    tt = aggregate(empty, {"t": {"t_test": {
        "a": {"field": "v"}, "b": {"field": "w"}}}})["t"].collect()[0]
    assert tt["t"] is None


def test_ip_prefix_malformed_skipped(spark):
    from elasticsearch_spark.plans.aggs import compile_agg

    df = spark.createDataFrame(
        [("10.1.2.3",), ("10.1.9.9",), ("10.1.2",), ("garbage",)], "ip string")
    out = compile_agg(df, "nets", {
        "ip_prefix": {"field": "ip", "prefix_length": 16}}).collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("10.1.0.0", 2)]


def test_bucket_selector_count_path(spark):
    from elasticsearch_spark.plans.aggs import aggregate

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    out = aggregate(df, {"g": {
        "terms": {"field": "k"},
        "aggs": {"sel": {"bucket_selector": {
            "buckets_path": {"c": "_count"}, "script": "params.c > 1"}}},
    }})["g"].collect()
    assert [(r["key"], r["doc_count"]) for r in out] == [("a", 2)]
