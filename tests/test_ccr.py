"""Cross-cluster replication (x-pack/plugin/ccr): file-based bootstrap of a
follower from a (remote) leader, incremental segment sync on poll, sync
after leader merges (segment replacement), pause/resume/unfollow."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine

LOCAL = "/tmp/es_spark_ccr_follower"
REMOTE = "/tmp/es_spark_ccr_leader"


def _docs(spark, urls):
    return spark.createDataFrame(
        [(u, f"text for {u} spark replication", "en") for u in urls],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))


@pytest.fixture(scope="module")
def engines(spark):
    for p in (LOCAL, REMOTE):
        shutil.rmtree(p, ignore_errors=True)
    leader_eng = Engine(spark, root=REMOTE)
    local = Engine(spark, root=LOCAL)
    leader_eng.create_index("pages", num_partitions=2)
    leader_eng.bulk("pages", _docs(spark, ["u1", "u2", "u3"]))
    local.put_remote_cluster("east", REMOTE)
    return local, leader_eng


def test_follow_bootstraps_searchable_copy(engines):
    local, _ = engines
    out = local.ccr_follow("east:pages", "pages_copy")
    assert out["follow_index_created"] and out["copied_segments"]
    assert local.count("pages_copy") == 3
    res = local.search("pages_copy", {"query": {"match": {"text": "replication"}}, "size": 5})
    assert len(res["hits"].collect()) == 3
    with pytest.raises(ValueError, match="already exists"):
        local.ccr_follow("east:pages", "pages_copy")


def test_poll_syncs_new_segments(engines, spark):
    local, leader = engines
    assert local.ccr_poll() == []  # nothing new
    leader.bulk("pages", _docs(spark, ["u4", "u5"]))
    actions = local.ccr_poll()
    assert actions and actions[0]["follower"] == "pages_copy"
    assert actions[0]["copied_segments"]
    assert local.count("pages_copy") == 5


def test_poll_after_leader_merge_replaces_segments(engines):
    local, leader = engines
    leader.forcemerge("pages")
    actions = local.ccr_poll()
    assert actions[0]["copied_segments"] and actions[0]["removed_segments"]
    assert local.count("pages_copy") == 5
    # rank sanity post-merge
    res = local.search("pages_copy", {"query": {"match": {"text": "spark"}}, "size": 5})
    assert len(res["hits"].collect()) == 5


def test_pause_resume_unfollow(engines, spark):
    local, leader = engines
    local.ccr_pause_follow("pages_copy")
    leader.bulk("pages", _docs(spark, ["u6"]))
    assert local.ccr_poll() == []  # paused followers don't sync
    assert local.count("pages_copy") == 5
    local.ccr_resume_follow("pages_copy")
    assert local.ccr_poll()[0]["copied_segments"]
    assert local.count("pages_copy") == 6
    st = local.ccr_stats()
    assert st["pages_copy"]["leader"] == "east:pages"
    local.ccr_unfollow("pages_copy")
    assert local.ccr_stats() == {}
    with pytest.raises(ValueError, match="not a follower"):
        local.ccr_pause_follow("pages_copy")
