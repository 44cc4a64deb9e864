"""Round-4 surface: completion context boosting, fields / docvalue_fields
retrieval, indices_boost."""

from __future__ import annotations

import os
import shutil

import pytest

from elasticsearch_spark.api import Engine

ROOT = "/tmp/es_spark_round4_api"


@pytest.fixture(scope="module")
def es(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    eng = Engine(spark, root=ROOT)
    for ix, docs in (
        ("left", [("u1", "spark rules the cluster", "en"),
                  ("u2", "plain text here", "en")]),
        ("right", [("v1", "spark rules the cluster", "en"),
                   ("v2", "other words entirely", "de")]),
    ):
        eng.create_index(ix, num_partitions=2)
        eng.bulk(ix, spark.createDataFrame(docs, "url string, text string, lang string"))
    return eng


def test_completion_context_boosting(spark, tmp_path_factory):
    from elasticsearch_spark.operators.suggest import (
        build_completion_index,
        completion_suggest,
    )

    idx = str(tmp_path_factory.mktemp("compb") / "idx")
    os.makedirs(idx, exist_ok=True)
    sugg = spark.createDataFrame(
        [("spark summit", 10, "event"), ("spark sql", 9, "tech"),
         ("spartan race", 20, "event")],
        "s string, w long, cat string",
    )
    build_completion_index(spark, idx, sugg, input_col="s", weight_col="w",
                           contexts_col="cat")
    # boost tech 5x: spark sql (9*5=45) outranks spartan race (20*1)
    out = completion_suggest(
        spark, idx, "spar", size=3, contexts={"tech": 5.0, "event": 1.0}
    ).collect()
    assert [r["suggestion"] for r in out] == ["spark sql", "spartan race", "spark summit"]
    assert out[0]["weight"] == 45


def test_fields_and_docvalue_fields(es):
    out = es.search("left", {
        "query": {"match": {"text": "spark"}},
        "fields": [{"field": "warc_ts", "format": "yyyy-MM-dd"}, "lang"],
        "docvalue_fields": [{"field": "warc_ts", "format": "epoch_millis"}],
    })["hits"].collect()
    assert out
    r = out[0]
    assert len(r["fields.warc_ts"]) in (10, 13)  # date string or epoch millis (last write wins)
    assert r["fields.lang"] == "en"


def test_runtime_mappings(es):
    # query + aggs over a search-time runtime field; emit() wrapper stripped
    out = es.search("left", {
        "query": {"term": {"lang_up": "EN"}},
        "runtime_mappings": {
            "lang_up": {"type": "keyword", "script": {"source": "emit(upper(lang))"}},
            "tl": {"type": "long", "script": {"source": "length(text)"}},
        },
        "aggs": {"m": {"max": {"field": "tl"}}},
        "size": 5,
    })
    assert out["hits"].count() == 2
    assert out["aggregations"]["m"].collect()[0]["m"] == len("spark rules the cluster")


def test_indices_boost(es):
    body = {"query": {"match": {"text": "spark"}}, "size": 10,
            "indices_boost": [{"right": 3.0}, {"left": 1.0}]}
    rows = es.search_multi(["left", "right"], body).collect()
    s = {(r["_index"]): r["_score"] for r in rows}
    # same doc text in both indices: boosted index scores exactly 3x
    assert abs(s["right"] - 3.0 * s["left"]) < 1e-9
    # and the boosted copy ranks first
    ranked = sorted(rows, key=lambda r: (-r["_score"]))
    assert ranked[0]["_index"] == "right"


def test_cat_segments_and_aliases(es, spark):
    segs = es.cat_segments("left")
    assert segs and all(s["docs.count"] > 0 and s["size"] > 0 for s in segs)
    es.update_aliases([{"add": {"alias": "both", "index": "left", "is_write_index": True}},
                       {"add": {"alias": "both", "index": "right"}}])
    cats = es.cat_aliases()
    assert {(c["alias"], c["index"], c["is_write_index"]) for c in cats} >= {
        ("both", "left", True), ("both", "right", False)}


def test_post_filter_narrows_hits_not_aggs(es):
    out = es.search("right", {
        "query": {"match": {"text": "spark"}},
        "post_filter": {"term": {"lang": "de"}},
        "aggs": {"langs": {"terms": {"field": "lang"}}},
        "size": 10,
    })
    # hits: only the de doc survives the post filter …
    hits = out["hits"].collect()
    assert hits == [] or all(r["lang"] == "de" for r in hits)
    # … but aggs see the full query scope (both langs of matching docs)
    buckets = {r["key"] for r in out["aggregations"]["langs"].collect()}
    assert "en" in buckets


def test_cat_count_shards_templates(es):
    total = es.cat_count()["count"]
    left = es.cat_count("left")["count"]
    assert left == 2 and total >= 4
    shards = es.cat_shards("left")
    assert sum(s["docs"] for s in shards) == 2
    assert sum(s["segments"] for s in shards) == len(es.cat_segments("left"))
    es.put_index_template("logs-t", ["logs-*"], priority=7)
    cats = es.cat_templates()
    assert {"name": "logs-t", "index_patterns": ["logs-*"], "order": 7} in cats


def test_async_search_lifecycle(es):
    sub = es.async_search_submit("left", {"query": {"match": {"text": "spark"}}, "size": 5})
    assert sub["is_running"] is True
    got = es.async_search_get(sub["id"], wait_seconds=60)
    assert got["is_running"] is False
    hits = got["response"]["hits"]
    assert len(hits) == 1 and hits[0]["url"] == "u1"
    es.async_search_delete(sub["id"])
    with pytest.raises(KeyError):
        es.async_search_get(sub["id"])


def test_data_stream_create_write_rollover(es, spark):
    es.put_index_template("metrics-t", ["metrics-*"], priority=3,
                          settings={"num_partitions": 2})
    es.create_data_stream("metrics-web")
    es.bulk("metrics-web", spark.createDataFrame(
        [("m1", "cpu high load", "en"), ("m2", "disk io wait", "en")],
        "url string, text string, lang string"))
    assert es.cat_count(".ds-metrics-web-000001")["count"] == 2
    rolled = es.rollover("metrics-web", conditions_met=True)
    assert rolled["new_index"] == ".ds-metrics-web-000002"
    streams = es.data_streams()
    st = next(s for s in streams if s["name"] == "metrics-web")
    assert st["generation"] == 2 and st["write_index"] == ".ds-metrics-web-000002"
    # search over the stream alias fans out across generations
    es.bulk("metrics-web", spark.createDataFrame(
        [("m3", "cpu throttled again", "en")], "url string, text string, lang string"))
    out = es.search("metrics-web", {"query": {"match": {"text": "cpu"}}, "size": 10})
    urls = {r["url"] for r in out["hits"].collect()}
    assert urls == {"m1", "m3"}


def test_async_search_delete_cancels_running_jobs(es, spark, monkeypatch):
    """DELETE of a RUNNING async search cancels the backing Spark job group
    (the x-pack async-search task-cancellation contract): the worker's jobs
    stop within a bound instead of running to completion, observed via
    sc.statusTracker."""
    import time

    from pyspark.sql.functions import udf

    sleep_row = udf(lambda x: (time.sleep(1.0), x)[1], "long")
    # 320 rows / 32 partitions × 1s per row ≈ 10s of task time per slot —
    # far longer than the cancellation bound asserted below
    slow_df = spark.range(320).repartition(32).select(
        sleep_row("id").alias("v"))
    monkeypatch.setattr(es, "search",
                        lambda index, body: {"hits": slow_df})
    sub = es.async_search_submit("left", {"query": {"match_all": {}}})
    sid = sub["id"]
    fut = es._async_searches[sid]
    deadline = time.time() + 10
    while not fut.running() and time.time() < deadline:
        time.sleep(0.05)  # wait until the worker thread actually started
    time.sleep(0.5)       # let the first job reach the scheduler
    t0 = time.time()
    assert es.async_search_delete(sid)["acknowledged"]
    # the future must finish (with a cancellation error) well before the
    # ~10s the uncancelled job would need
    with pytest.raises(Exception):
        fut.result(timeout=8)
    assert time.time() - t0 < 8
    # and the scheduler drains: no active jobs left within the bound
    st = spark.sparkContext.statusTracker()
    deadline = time.time() + 5
    while st.getActiveJobsIds() and time.time() < deadline:
        time.sleep(0.1)
    assert not st.getActiveJobsIds()
    assert sid not in es._async_searches
