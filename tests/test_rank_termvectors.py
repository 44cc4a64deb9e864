"""RRF fusion, retriever search body, _termvectors, _stats, geo_distance
agg, cumulative_cardinality pipeline."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine
from elasticsearch_spark.operators.rank import rrf_fuse
from elasticsearch_spark.plans import dsl
from elasticsearch_spark.plans.aggs import aggregate

ROOT = "/tmp/es_spark_rank_test"


@pytest.fixture(scope="module")
def es(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    eng = Engine(spark, root=ROOT)
    eng.create_index("pages", num_partitions=2)
    docs = spark.createDataFrame(
        [
            ("u1", "spark spark spark distributed computing", "en"),
            ("u2", "the lazy dog sleeps in the sun", "en"),
            ("u3", "spark streaming handles realtime data", "en"),
            ("u4", "dogs and cats live together", "de"),
            ("u5", "computing platforms compared in detail", "en"),
        ],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
    eng.bulk("pages", docs)
    return eng


def test_rrf_fuse_math(spark):
    # ranker A ranks d1, d2; ranker B ranks d2, d1 → d1: 1/61+1/62, d2 same
    a = spark.createDataFrame([("d1", 2.0), ("d2", 1.0)], "id string, score double")
    b = spark.createDataFrame([("d2", 9.0), ("d1", 3.0)], "id string, score double")
    out = rrf_fuse([a, b], id_col="id", score_col="score", k=5).collect()
    expect = round(1 / 61 + 1 / 62, 6)
    assert {r.id: r.rrf_score for r in out} == {"d1": expect, "d2": expect}
    assert all(r.matched_rankers == 2 for r in out)
    # tie → id ASC
    assert [r.id for r in out] == ["d1", "d2"]


def test_rrf_window_excludes_deep_ranks(spark):
    a = spark.createDataFrame(
        [(f"d{i}", float(100 - i)) for i in range(10)], "id string, score double"
    )
    out = rrf_fuse([a], id_col="id", score_col="score", rank_window_size=3, k=10)
    assert out.count() == 3


def test_retriever_rrf_search_body(spark):
    df = spark.createDataFrame(
        [
            (1, "spark rules", [1.0, 0.0]),
            (2, "nothing here", [0.9, 0.1]),
            (3, "spark spark spark", [0.0, 1.0]),
        ],
        "doc_id long, text string, vec array<double>",
    )
    body = {
        "retriever": {"rrf": {
            "retrievers": [
                {"standard": {"query": {"match": {"text": "spark"}}}},
                {"knn": {"field": "vec", "query_vector": [1.0, 0.0], "k": 2}},
            ],
            "rank_constant": 60, "rank_window_size": 10,
        }},
        "size": 3,
    }
    hits = dsl.search(spark, df, body).collect()
    got = {r.doc_id: r._score for r in hits}
    # doc1: bm25 rank 2 (tf 1 < tf 3) + knn rank 1 → 1/62 + 1/61
    assert got[1] == round(1 / 62 + 1 / 61, 6)
    # doc3: bm25 rank 1, knn rank >2 (outside k=2 window)
    assert got[3] == round(1 / 61, 6)
    # doc2: no bm25 match, knn rank 2
    assert got[2] == round(1 / 62, 6)


def test_termvectors(es):
    tv = es.termvectors("pages", "u1").collect()
    by_term = {r.term: r for r in tv}
    assert by_term["spark"].term_freq == 3
    assert by_term["spark"].positions == [0, 1, 2]
    assert by_term["computing"].positions == [4]


def test_termvectors_term_statistics(es):
    tv = es.termvectors("pages", "u3", term_statistics=True).collect()
    by_term = {r.term: r for r in tv}
    # "spark" appears in u1 (tf 3) and u3 (tf 1) → df 2, cf 4
    assert by_term["spark"].df == 2
    assert by_term["spark"].cf == 4
    assert by_term["streaming"].df == 1


def test_stats(es):
    st = es.stats("pages")
    assert st["docs"]["count"] == 5
    assert st["segments"]["count"] >= 1
    assert st["store"]["size_in_bytes"] > 0


def test_geo_distance_agg(spark):
    # one point ~111 km north of origin, one ~1113 km, one antipodal-ish
    df = spark.createDataFrame(
        [(1, 1.0, 0.0), (2, 10.0, 0.0), (3, 80.0, 170.0)],
        "id long, lat double, lon double",
    )
    out = aggregate(df, {"rings": {"geo_distance": {
        "origin": {"lat": 0.0, "lon": 0.0},
        "lat_field": "lat", "lon_field": "lon", "unit": "km",
        "ranges": [{"to": 500}, {"from": 500, "to": 5000}, {"from": 5000}],
    }}})["rings"].collect()
    counts = {r.key: r.doc_count for r in out}
    assert counts == {"*-500.0": 1, "500.0-5000.0": 1, "5000.0-*": 1}


def test_cumulative_cardinality(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 10:00:00", 1), ("2024-01-01 11:00:00", 2),
            ("2024-01-02 10:00:00", 1), ("2024-01-02 11:00:00", 3),
            ("2024-01-03 10:00:00", 3),
        ],
        "ts string, user_id long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = aggregate(df, {"per_day": {
        "date_histogram": {"field": "ts", "calendar_interval": "1d"},
        "aggs": {
            "users": {"cardinality": {"field": "user_id", "precision_threshold": 40000}},
            "total": {"cumulative_cardinality": {"buckets_path": "users"}},
        },
    }})["per_day"].orderBy("key").collect()
    assert [r.total for r in out] == [2, 3, 3]
    assert [r.users for r in out] == [2, 2, 1]


def test_sparse_vector_query(spark):
    df = spark.createDataFrame(
        [(1, "spark spark merge"), (2, "merge only"), (3, "nothing relevant")],
        "doc_id long, text string",
    )
    hits = dsl.search(spark, df, {"query": {"sparse_vector": {
        "field": "text", "query_vector": {"spark": 2.0, "merge": 1.0},
    }}, "size": 10}).collect()
    got = {r.doc_id: r._score for r in hits}
    assert got == {1: 5.0, 2: 1.0}


def test_sparse_vector_map_column(spark):
    df = spark.createDataFrame(
        [(1, {"spark": 1.5, "x": 0.2}), (2, {"y": 3.0})],
        "doc_id long, feats map<string,double>",
    )
    hits = dsl.search(spark, df, {"query": {"sparse_vector": {
        "field": "feats", "query_vector": {"spark": 2.0},
    }}, "size": 10}).collect()
    assert {r.doc_id: r._score for r in hits} == {1: 3.0}


def test_moving_avg_alias(spark):
    df = spark.createDataFrame(
        [(float(i), float(i)) for i in range(1, 6)], "n_chars double, v double"
    )
    out = aggregate(df, {"h": {
        "histogram": {"field": "n_chars", "interval": 1},
        "aggs": {"s": {"sum": {"field": "v"}},
                 "ma": {"moving_avg": {"buckets_path": "s", "window": 2}}},
    }})["h"].orderBy("key").collect()
    # the alias shares moving_fn's window contract (shift=0 excludes the
    # current bucket — MovFnPipelineAggregator.java:112); shift=1 restores
    # the old moving_avg inclusive window
    assert [r.ma for r in out] == [None, 1.0, 1.5, 2.5, 3.5]
    out = aggregate(df, {"h": {
        "histogram": {"field": "n_chars", "interval": 1},
        "aggs": {"s": {"sum": {"field": "v"}},
                 "ma": {"moving_fn": {"buckets_path": "s", "window": 2,
                                      "shift": 1}}},
    }})["h"].orderBy("key").collect()
    assert [r.ma for r in out] == [1.0, 1.5, 2.5, 3.5, 4.5]


def test_source_filtering_includes_excludes(spark):
    df = spark.createDataFrame(
        [(1, "spark", "en", "s1")], "doc_id long, text string, lang string, source string"
    )
    out = dsl.search(spark, df, {"query": {"match_all": {}},
                                 "_source": {"includes": ["*"], "excludes": ["text"]}})
    assert set(out.columns) == {"doc_id", "_score", "lang", "source"}
    out2 = dsl.search(spark, df, {"query": {"match_all": {}}, "_source": ["la*"]})
    assert set(out2.columns) == {"doc_id", "_score", "lang"}
    out3 = dsl.search(spark, df, {"query": {"match_all": {}}, "_source": False})
    assert set(out3.columns) == {"doc_id", "_score"}


def test_profile_returns_spark_plan(es):
    res = es.search("pages", {"query": {"match": {"text": "spark"}}, "profile": True})
    assert "Physical Plan" in res["profile"]["hits_plan"]


def test_linear_retriever_minmax(spark):
    df = spark.createDataFrame(
        [
            (1, "spark spark spark", [1.0, 0.0]),
            (2, "spark", [0.8, 0.2]),
            (3, "nothing", [0.0, 1.0]),
        ],
        "doc_id long, text string, vec array<double>",
    )
    body = {
        "retriever": {"linear": {
            "retrievers": [
                {"retriever": {"standard": {"query": {"match": {"text": "spark"}}}}, "weight": 2.0},
                {"retriever": {"knn": {"field": "vec", "query_vector": [1.0, 0.0], "k": 3}}, "weight": 1.0},
            ],
            "normalizer": "minmax",
        }},
        "size": 3,
    }
    hits = dsl.search(spark, df, body).collect()
    got = {r.doc_id: r._score for r in hits}
    # bm25 minmax: doc1=1, doc2=0; knn cosines: doc1=1, doc2=0.8/√0.68,
    # doc3=0 → minmax keeps them (range is [0,1] already)
    assert got[1] == 3.0
    assert got[2] == round(0.8 / (0.68 ** 0.5), 6)
    assert got[3] == 0.0


def test_script_fields(spark):
    df = spark.createDataFrame([(1, "a b c", 3)], "doc_id long, text string, n long")
    out = dsl.search(spark, df, {
        "query": {"match_all": {}},
        "script_fields": {"n2": {"script": {"source": "n * 2"}}},
        "_source": ["text"],
    }).collect()[0]
    assert out.n2 == 6 and out.text == "a b c"


def test_rank_eval_metrics_exact(spark):
    import math

    from elasticsearch_spark.operators.rank import rank_eval

    results = spark.createDataFrame(
        [("q1", d, r) for r, d in enumerate(["a", "b", "c", "d", "e"], 1)]
        + [("q2", "x", 1), ("q2", "y", 2)],
        "query_id string, doc_id string, rank int",
    )
    ratings = spark.createDataFrame(
        [("q1", "a", 3), ("q1", "b", 0), ("q1", "c", 1), ("q1", "f", 2),
         ("q2", "z", 1)],  # q2 retrieves nothing relevant
        "query_id string, doc_id string, rating int",
    )
    out = {r["query_id"]: r.asDict() for r in
           rank_eval(results, ratings, k=5).collect()}
    q1 = out["q1"]
    assert abs(q1["p_at_k"] - 2 / 5) < 1e-12
    assert abs(q1["recall_at_k"] - 2 / 3) < 1e-12
    assert q1["mrr"] == 1.0
    dcg = 7 / math.log2(2) + 1 / math.log2(4)
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert abs(q1["dcg"] - dcg) < 1e-12
    assert abs(q1["ndcg"] - dcg / idcg) < 1e-12
    err = 7 / 8 + (1 / 3) * (1 / 8) * (1 - 7 / 8)  # rank2 R=0, unlabeled R=0
    assert abs(q1["err"] - err) < 1e-12
    q2 = out["q2"]
    assert q2["p_at_k"] == 0.0 and q2["mrr"] == 0.0 and q2["err"] == 0.0
    assert q2["recall_at_k"] == 0.0 and q2["ndcg"] == 0.0
