"""Routing-pruned search (?routing= / IndexRouting.java) + shard-aware
tiered merge. ``num_shards`` (the number_of_shards index setting) is
decoupled from build parallelism: shard = pid % S with S | P. Merged
segments stay shard-pure, routed queries scan only the routed shard's
segments, and results equal the shard-restricted full search."""

from __future__ import annotations

import shutil

import pytest

from elasticsearch_spark.operators.merge import merge_index, plan_merges
from elasticsearch_spark.operators.postings import build_index
from elasticsearch_spark.operators.topk import routed_segs, routing_shard, search_topk
from elasticsearch_spark.sources import index_store as store
from elasticsearch_spark.sources.pages import pages_df

IDX = "/tmp/es_spark_test_routing_idx"
P, S = 6, 3  # 6 build partitions, 3 routing shards → 2 segments/shard


def _build(spark):
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(spark, pages_df(spark, 300, n_parts=4), IDX, num_partitions=P, num_shards=S)
    return store.IndexMeta.load(IDX)


def test_num_shards_must_divide_partitions(spark):
    shutil.rmtree(IDX, ignore_errors=True)
    with pytest.raises(ValueError, match="must divide"):
        build_index(spark, pages_df(spark, 50, n_parts=2), IDX, num_partitions=6, num_shards=4)


def test_routing_requires_sharded_index(spark):
    shutil.rmtree(IDX, ignore_errors=True)
    build_index(spark, pages_df(spark, 50, n_parts=2), IDX, num_partitions=4)
    with pytest.raises(ValueError, match="num_shards"):
        search_topk(spark, IDX, ["the"], k=3, fetch=False, routing="u1").collect()


def test_routed_search_prunes_and_matches(spark):
    meta = _build(spark)
    url = spark.read.parquet(*store.docs_glob(IDX)).select("url").limit(1).collect()[0]["url"]
    shard = routing_shard(spark, url, S)
    segs = store.list_segs(IDX)
    pruned = routed_segs(spark, IDX, segs, url, meta)
    assert len(pruned) == P // S  # 2 of 6 segments
    assert all(store.shard_of(IDX, s, meta) == shard for s in pruned)

    _assert_routed_equals_shard_restricted(spark, meta, url, pruned)


def test_merge_is_shard_aware_and_routing_survives(spark):
    meta = _build(spark)
    # shard-pure groups only: 3 groups of 2 (one per shard)
    groups = plan_merges(IDX, segments_per_tier=8)
    assert len(groups) == S
    for g in groups:
        assert len({store.shard_of(IDX, s, meta) for s in g}) == 1
    info = merge_index(spark, IDX, segments_per_tier=8)
    assert info["merges"] == S

    segs = store.list_segs(IDX)
    shards = [store.shard_of(IDX, s, meta) for s in segs]
    assert sorted(shards) == list(range(S))  # one shard-pure segment per shard

    url = spark.read.parquet(*store.docs_glob(IDX)).select("url").limit(1).collect()[0]["url"]
    pruned = routed_segs(spark, IDX, segs, url, meta)
    assert len(pruned) == 1
    _assert_routed_equals_shard_restricted(spark, meta, url, pruned)


def test_engine_search_routing(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path))
    es.create_index("pages", num_partitions=6, num_shards=3)
    es.bulk("pages", pages_df(spark, 200, n_parts=2))
    url = "https://site1.example/de/page00000001"
    full = es.search("pages", {"query": {"match": {"text": "the"}}, "size": 5})["hits"]
    routed = es.search(
        "pages", {"query": {"match": {"text": "the"}}, "size": 5}, routing=url
    )["hits"]
    # the routed search sees one shard; any overlap scores identically
    f = {r["url"]: round(r["score"], 9) for r in full.collect()}
    r = {r["url"]: round(r["score"], 9) for r in routed.collect()}
    assert r  # non-empty
    for u in set(f) & set(r):
        assert f[u] == r[u]


def _assert_routed_equals_shard_restricted(spark, meta, url, pruned):
    full = {(r["doc_id"], round(r["score"], 9)) for r in
            search_topk(spark, IDX, ["the"], k=10, fetch=False).collect()}
    routed = {(r["doc_id"], round(r["score"], 9)) for r in
              search_topk(spark, IDX, ["the"], k=10, fetch=False, routing=url).collect()}
    shard_doc_ids = {
        r["doc_id"]
        for s in pruned
        for r in spark.read.parquet(f"{IDX}/segments/seg={s}/docs.parquet")
        .select("doc_id").collect()
    }
    # routed = the SHARD's top-k: every global hit living in the shard
    # appears with an identical score (df/avgdl are global), and every
    # routed hit belongs to the shard
    assert {(d, s) for d, s in full if d in shard_doc_ids} <= routed
    assert {d for d, _ in routed} <= shard_doc_ids
    assert routed  # the shard is non-empty for a stopword query


def test_op_batch_segments_route_correctly(spark):
    """Op-batch segments allocate dense ids; their routing shard is
    recorded in the build manifest (the old arithmetic derivation silently
    pruned segments containing the routed doc)."""
    from elasticsearch_spark.operators.ops import apply_ops

    meta = _build(spark)
    ops = spark.createDataFrame(
        [(f"https://new{i}.example/x", "index", "fresh routed words here",
          "en", None) for i in range(7)],
        "url string, op string, text string, lang string, warc_ts timestamp")
    counts = apply_ops(spark, IDX, ops)
    assert counts["indexed"] == 7
    op_segs = [s for s in store.list_segs(IDX) if s >= store.OPS_SEG_BASE]
    assert op_segs
    for s in op_segs:
        assert store.shard_of(IDX, s, meta) in range(S)
    # every new doc is findable through ITS routed search
    for i in range(7):
        url = f"https://new{i}.example/x"
        hits = search_topk(spark, IDX, ["routed"], k=50, fetch=True,
                           routing=url).collect()
        assert url in {r["url"] for r in hits}, url
