"""Bulk op lifecycle: index/create/update/delete, tombstone masking at
query time, expunge-on-merge (InternalEngine delete+add semantics)."""

from __future__ import annotations

import datetime as dt
import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators.merge import merge_index
from elasticsearch_spark.operators.ops import apply_ops, live_docs, read_tombstones
from elasticsearch_spark.operators.postings import build_index
from elasticsearch_spark.operators.topk import search_topk
from elasticsearch_spark.sources import index_store as store

OPS_DIR = "/tmp/es_spark_ops_test"
TS = dt.datetime(2024, 6, 1)


def _ops_df(spark, rows):
    return spark.createDataFrame(
        [(u, op, t, "en", TS) for u, op, t in rows],
        "url string, op string, text string, lang string, warc_ts timestamp",
    )


@pytest.fixture(scope="module")
def ops_index(spark):
    shutil.rmtree(OPS_DIR, ignore_errors=True)
    rows = [
        ("u1", "zebra apple mango"),
        ("u2", "zebra zebra banana"),
        ("u3", "plain words here"),
        ("u4", "apple pie zebra"),
    ]
    df = spark.createDataFrame(rows, "url string, text string").select(
        "url", F.lit(TS).cast("timestamp").alias("warc_ts"), "text", F.lit("en").alias("lang")
    )
    build_index(spark, df, OPS_DIR, num_partitions=2)
    return OPS_DIR


def test_delete_masks_doc(spark, ops_index):
    before = {r["url"] for r in search_topk(spark, ops_index, ["zebra"], k=10).collect()}
    assert before == {"u1", "u2", "u4"}
    counts = apply_ops(spark, ops_index, _ops_df(spark, [("u2", "delete", None)]))
    assert counts["deleted"] == 1
    after = {r["url"] for r in search_topk(spark, ops_index, ["zebra"], k=10).collect()}
    assert after == {"u1", "u4"}
    assert live_docs(spark, ops_index).count() == 3


def test_update_is_delete_plus_add(spark, ops_index):
    counts = apply_ops(spark, ops_index, _ops_df(spark, [("u1", "update", "quokka only now")]))
    assert counts["updated"] == 1
    assert {r["url"] for r in search_topk(spark, ops_index, ["quokka"], k=10).collect()} == {"u1"}
    # old content of u1 is no longer searchable
    assert {r["url"] for r in search_topk(spark, ops_index, ["zebra"], k=10).collect()} == {"u4"}
    assert live_docs(spark, ops_index).count() == 3


def test_create_conflict_and_new(spark, ops_index):
    counts = apply_ops(
        spark, ops_index,
        _ops_df(spark, [("u3", "create", "should conflict"), ("u9", "create", "fresh walrus doc")]),
    )
    assert counts["create_conflicts"] == 1 and counts["created"] == 1
    assert {r["url"] for r in search_topk(spark, ops_index, ["walrus"], k=10).collect()} == {"u9"}
    # u3 unchanged (create never overwrites)
    assert {r["url"] for r in search_topk(spark, ops_index, ["plain"], k=10).collect()} == {"u3"}


def test_merge_expunges_tombstones(spark, ops_index):
    assert len(read_tombstones(ops_index)) == 2  # u2 delete + u1 update
    n_live = live_docs(spark, ops_index).count()
    merge_index(spark, ops_index, segments_per_tier=10, floor_bytes=1)
    assert len(read_tombstones(ops_index)) == 0  # expunged
    docs = spark.read.parquet(*store.docs_glob(ops_index))
    assert docs.count() == n_live  # dead versions physically gone
    meta = store.IndexMeta.load(ops_index)
    assert meta.doc_count == n_live
    # results unchanged by the expunging merge
    assert {r["url"] for r in search_topk(spark, ops_index, ["zebra"], k=10).collect()} == {"u4"}
    assert {r["url"] for r in search_topk(spark, ops_index, ["quokka"], k=10).collect()} == {"u1"}


def test_external_versioning(spark, tmp_path):
    """VersionType.EXTERNAL optimistic concurrency: a bulk whose version is
    not strictly greater than the stored one is a version conflict."""
    import shutil as _sh

    from pyspark.sql import functions as F

    from elasticsearch_spark.api import Engine

    root = str(tmp_path / "ver_eng")
    _sh.rmtree(root, ignore_errors=True)
    es = Engine(spark, root=root)
    es.create_index("pages", num_partitions=2)

    def batch(rows):
        return spark.createDataFrame(
            rows, "url string, text string, lang string, version long"
        ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))

    es.bulk("pages", batch([("u1", "v5 text", "en", 5), ("u2", "v1 text", "en", 1)]))
    # stale (3 <= 5) → conflict; newer (2 > 1) → update
    res = es.bulk("pages", batch([("u1", "v3 stale", "en", 3),
                                  ("u2", "v2 newer", "en", 2)]),
                  version_type="external")
    assert res["version_conflicts"] == 1
    assert res["updated"] == 1
    texts = {r["url"]: (r["text"], r["version"])
             for r in es._docs_view("pages").collect()}
    assert texts["u1"] == ("v5 text", 5)      # stale write rejected
    assert texts["u2"] == ("v2 newer", 2)     # newer write applied
    # equal version is also a conflict (strictly-greater contract)
    res2 = es.bulk("pages", batch([("u2", "v2 again", "en", 2)]),
                   version_type="external")
    assert res2["version_conflicts"] == 1 and res2["updated"] == 0


def test_intra_batch_op_sequencing(spark, tmp_path):
    """Bulk ops on the same url apply in row order (TransportBulkAction
    executes sequentially per id): index-then-delete leaves the doc dead,
    create-then-create conflicts, delete-then-index revives as a fresh doc,
    and index-then-index keeps the LAST body."""
    d = str(tmp_path / "seq_idx")
    base = spark.createDataFrame(
        [("s1", "seed words here")], "url string, text string").select(
        "url", F.lit(TS).cast("timestamp").alias("warc_ts"), "text",
        F.lit("en").alias("lang"))
    build_index(spark, base, d, num_partitions=1)

    counts = apply_ops(spark, d, _ops_df(spark, [
        ("n1", "index", "fresh doc body"),
        ("n1", "delete", None),               # deletes the op two lines up
        ("c1", "create", "first create"),
        ("c1", "create", "second create"),    # conflict vs the in-batch one
        ("s1", "delete", None),
        ("s1", "index", "revived body"),      # revive after in-batch delete
        ("w1", "index", "first body"),
        ("w1", "index", "second body"),       # last write wins
    ]))
    assert counts["deleted"] == 2
    assert counts["create_conflicts"] == 1
    assert counts["created"] == 1
    assert counts["indexed"] == 3     # n1, s1-revival, w1-first
    assert counts["updated"] == 1     # w1 second write over the in-batch one
    live = {r["url"]: r for r in live_docs(spark, d).collect()}
    assert set(live) == {"c1", "s1", "w1"}  # n1 dead, one doc per url
    hits = {r["url"] for r in search_topk(spark, d, ["second"], k=10).collect()}
    assert hits == {"w1"}  # w1 carries the LAST body
    assert not {r["url"] for r in search_topk(spark, d, ["fresh"], k=10).collect()}
