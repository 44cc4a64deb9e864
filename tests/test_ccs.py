"""Cross-cluster search (TransportSearchAction's remote-cluster split +
RemoteClusterService registration): `remote:index` names resolve against the
remote engine's alias table, scan the remote's storage, and merge into one
scored result with cluster-qualified `_index` values."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine

LOCAL = "/tmp/es_spark_ccs_local"
REMOTE = "/tmp/es_spark_ccs_remote"


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "url string, text string, lang string"
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))


@pytest.fixture(scope="module")
def engines(spark):
    for p in (LOCAL, REMOTE):
        shutil.rmtree(p, ignore_errors=True)
    local = Engine(spark, root=LOCAL)
    remote = Engine(spark, root=REMOTE)
    local.create_index("pages", num_partitions=2)
    local.bulk("pages", _docs(spark, [
        ("l1", "spark cluster computing at scale", "en"),
        ("l2", "quiet morning no matches here", "en"),
    ]))
    remote.create_index("pages", num_partitions=2)
    remote.bulk("pages", _docs(spark, [
        ("r1", "spark on the remote cluster", "en"),
        ("r2", "unrelated text entirely", "de"),
    ]))
    remote.create_index("archive", num_partitions=2)
    remote.bulk("archive", _docs(spark, [
        ("a1", "archived spark pages", "en"),
    ]))
    remote.update_aliases([
        {"add": {"alias": "everything", "index": "pages"}},
        {"add": {"alias": "everything", "index": "archive"}},
    ])
    local.put_remote_cluster("west", REMOTE)
    return local, remote


def test_remote_registration(engines):
    local, _ = engines
    assert local.get_remote_clusters() == {"west": {"root": REMOTE}}
    with pytest.raises(ValueError, match="invalid remote cluster name"):
        local.put_remote_cluster("a:b", REMOTE)


def test_resolve_qualifies_remote(engines):
    local, _ = engines
    assert local.resolve("west:pages") == ["west:pages"]
    # remote ALIAS resolution happens in the remote's alias table
    assert local.resolve("west:everything") == ["west:pages", "west:archive"]
    assert local.resolve("pages,west:pages") == ["pages", "west:pages"]


def test_unknown_cluster_refuses(engines):
    local, _ = engines
    with pytest.raises(ValueError, match="unknown remote cluster"):
        local.search("east:pages", {"query": {"match_all": {}}})


def test_ccs_search_merges_and_qualifies(engines):
    local, _ = engines
    res = local.search(
        "pages,west:everything",
        {"query": {"match": {"text": "spark"}}, "size": 10},
    )
    hits = res["hits"].collect()
    got = {(r["_index"], r["url"]) for r in hits}
    assert got == {
        ("pages", "l1"),
        ("west:pages", "r1"),
        ("west:archive", "a1"),
    }
    # merged top-k is globally score-sorted
    scores = [r["_score"] for r in hits]
    assert scores == sorted(scores, reverse=True)


def test_ccs_search_remote_only(engines):
    local, _ = engines
    res = local.search("west:pages", {"query": {"match": {"text": "remote"}}, "size": 5})
    hits = res["hits"].collect()
    assert [r["url"] for r in hits] == ["r1"]


def test_ccs_indices_boost(engines):
    local, _ = engines
    res = local.search(
        "pages,west:pages",
        {
            "query": {"match": {"text": "spark"}},
            "indices_boost": [{"west:pages": 10.0}],
            "size": 5,
        },
    )
    hits = res["hits"].collect()
    assert hits[0]["_index"] == "west:pages"
