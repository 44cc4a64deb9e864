"""Regression tests for the round-2 review findings: stored-fields update
path, post_filter semantics (scores untouched, fast-path coverage), routed
op batches, epoch_millis precision, version pre-release numerics, flattened
keyword ranges, fields retrieval on index-path hits, HNSW null vectors."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine


@pytest.fixture(scope="module")
def es(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("fixes") / "root")
    eng = Engine(spark, root=root)
    eng.create_index("docs", num_partitions=4, num_shards=2)
    rows = [
        ("u1", "alpha beta gamma", "en", 7, [1.0, 0.0]),
        ("u2", "beta beta delta", "en", 3, [0.0, 1.0]),
        ("u3", "alpha delta", "de", 9, None),
    ]
    eng.bulk("docs", spark.createDataFrame(
        rows, "url string, text string, lang string, rank int, emb array<float>"
    ))
    return eng


def test_update_carries_custom_stored_fields(es, spark):
    # finding #1: update on a custom-field index must not trip the schema
    # guard, and must preserve the extras
    es.update("docs", "u2", {"text": "beta beta epsilon"})
    got = es.get("docs", "u2")
    assert got["text"] == "beta beta epsilon"
    assert got["rank"] == 3 and list(got["emb"]) == [0.0, 1.0]


def test_update_by_query_carries_custom_fields(es):
    es.update_by_query("docs", {"term": {"lang": "de"}}, "concat(text, ' zz')")
    got = es.get("docs", "u3")
    assert got["text"].endswith(" zz") and got["rank"] == 9


def test_routed_search_sees_op_batch_docs(es, spark):
    # finding #3: op batches route with the index's partition count, so a
    # routed search still finds the updated doc
    hits = es.search(
        "docs", {"query": {"match": {"text": "epsilon"}}, "size": 5}, routing="u2"
    )["hits"].collect()
    assert any(r["url"] == "u2" for r in hits)


def test_post_filter_does_not_change_scores(es):
    # finding #6: scores use full-corpus stats; post_filter only drops hits
    body = {"query": {"bool": {"should": [{"term": {"lang": "en"}},
                                          {"term": {"lang": "de"}}]}}, "size": 10}
    base = {r["url"]: r["_score"] for r in es.search("docs", body)["hits"].collect()}
    body_pf = dict(body, post_filter={"term": {"lang": "en"}})
    filt = {r["url"]: r["_score"] for r in es.search("docs", body_pf)["hits"].collect()}
    assert set(filt) < set(base)
    for u, s in filt.items():
        assert s == base[u]


def test_post_filter_on_phrase_fast_path(es):
    # finding #2: match_phrase + post_filter falls through to the DSL path
    out = es.search("docs", {
        "query": {"match_phrase": {"text": "alpha beta"}},
        "post_filter": {"term": {"lang": "de"}},
        "size": 5,
    })["hits"].collect()
    assert out == []  # the only "alpha beta" phrase doc is en
    with pytest.raises(ValueError, match="post_filter"):
        es.search("docs", {
            "query": {"span_term": {"text": "alpha"}},
            "post_filter": {"term": {"lang": "en"}},
        })


def test_fields_retrieval_on_index_fast_path(es):
    # finding #9: match fast-path hits lack doc columns; fields joins them
    out = es.search("docs", {
        "query": {"match": {"text": "beta"}},
        "fields": ["lang", "rank"],
        "size": 5,
    })["hits"].collect()
    assert out and all(r["fields.lang"] in ("en", "de") for r in out)
    assert all(r["fields.rank"] is not None for r in out)


def test_epoch_millis_keeps_milliseconds(es, spark):
    # finding #5
    import datetime as dt

    eng = es
    eng.create_index("ts", num_partitions=2)
    eng.bulk("ts", spark.createDataFrame(
        [("t1", "hello world", "en", dt.datetime(2023, 1, 1, 0, 0, 0, 123000))],
        "url string, text string, lang string, warc_ts timestamp",
    ))
    out = eng.search("ts", {
        "query": {"match_all": {}},
        "docvalue_fields": [{"field": "warc_ts", "format": "epoch_millis"}],
    })["hits"].collect()
    assert out[0]["fields.warc_ts"] == "1672531200123"


def test_version_sort_numeric_prerelease_spark(spark):
    from elasticsearch_spark.plans.fields import version_sort_key

    vs = ["1.0.0-beta.10", "1.0.0-beta.2", "1.0.0-beta", "1.0.0"]
    df = spark.createDataFrame([(v,) for v in vs], "v string")
    got = [r.v for r in df.orderBy(version_sort_key("v")).collect()]
    # semver: beta < beta.2 < beta.10 < release
    assert got == ["1.0.0-beta", "1.0.0-beta.2", "1.0.0-beta.10", "1.0.0"]


def test_flattened_keyword_range(spark):
    from elasticsearch_spark.plans.dsl import SearchContext
    from elasticsearch_spark.plans.fields import FlattenedQ

    df = spark.createDataFrame(
        [("a", '{"tag": "beta"}'), ("b", '{"tag": "zeta"}')], "id string, props string"
    )
    ctx = SearchContext(df=df, key="id")
    q = FlattenedQ(fld="props", key="tag", op="range", gte="a", lte="m")
    got = sorted(r.id for r in df.where(q.predicate(ctx)).collect())
    assert got == ["a"]  # lexicographic: beta in [a, m], zeta not


def test_hnsw_build_skips_null_vectors(spark, tmp_path):
    # finding #7: docs without a vector are skipped, not a crash
    from elasticsearch_spark.operators.hnsw import build_hnsw_index, hnsw_topk

    rows = [(1, [1.0, 0.0]), (2, None), (3, [0.0, 1.0]), (4, [])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "g")
    build_hnsw_index(df, "vec_id", "embedding", path, n_graphs=2, M=4, ef_construction=10)
    got = [r["key"] for r in hnsw_topk(spark, path, [1.0, 0.0], k=5).collect()]
    assert set(got) == {1, 3}
