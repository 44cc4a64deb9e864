"""SLM (x-pack/plugin/slm, SnapshotLifecyclePolicy / SnapshotRetentionTask):
policy CRUD, date-math snapshot names, execute over wildcard index configs,
and retention (expire_after bounded by min_count, max_count trim)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine

ROOT = "/tmp/es_spark_slm_test"
REPO = "/tmp/es_spark_slm_repo"

DAY = 86400.0
T0 = 1700000000.0  # 2023-11-14 22:13:20 UTC


def _docs(spark, urls):
    return spark.createDataFrame(
        [(u, f"text for {u} spark", "en") for u in urls],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))


@pytest.fixture(scope="module")
def es(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    shutil.rmtree(REPO, ignore_errors=True)
    os.makedirs(REPO)
    eng = Engine(spark, root=ROOT)
    eng.create_index("logs-a", num_partitions=1)
    eng.bulk("logs-a", _docs(spark, ["u1", "u2"]))
    eng.create_index("logs-b", num_partitions=1)
    eng.bulk("logs-b", _docs(spark, ["u3"]))
    eng.create_index("metrics-a", num_partitions=1)
    eng.bulk("metrics-a", _docs(spark, ["u4"]))
    return eng


def test_policy_validation(es):
    with pytest.raises(ValueError, match="missing required field"):
        es.put_slm_policy("bad", {"repository": REPO})
    with pytest.raises(ValueError, match="unsupported SLM retention"):
        es.put_slm_policy("bad", {
            "name": "<s-{now/d}>", "repository": REPO,
            "retention": {"keep_forever": True},
        })


def test_execute_snapshots_matching_indices(es):
    es.put_slm_policy("nightly", {
        "schedule": "0 30 1 * * ?",
        "name": "<nightly-{now/d}>",
        "repository": REPO,
        "config": {"indices": ["logs-*"]},
        "retention": {"expire_after": "7d", "min_count": 2, "max_count": 4},
    })
    out = es.execute_slm_policy("nightly", now=T0)
    assert out["indices"] == ["logs-a", "logs-b"]  # metrics-a not matched
    assert out["snapshot_name"] == "nightly-2023.11.14"
    assert os.path.isdir(os.path.join(REPO, "nightly-2023.11.14", "logs-a"))
    assert not os.path.exists(
        os.path.join(REPO, "nightly-2023.11.14", "metrics-a"))
    # restore round-trip proves the snapshot is complete
    es.restore(REPO, "nightly-2023.11.14", "logs-a", rename_to="logs-a-restored")
    hits = es.search("logs-a-restored", {"query": {"match_all": {}}})["hits"]
    assert hits.count() == 2


def test_date_math_units(es):
    assert Engine._resolve_snapshot_name("<x-{now/M}>", T0) == "x-2023.11.01"
    assert Engine._resolve_snapshot_name("<x-{now/h}>", T0) == "x-2023.11.14-22"
    assert Engine._resolve_snapshot_name("plain", T0) == "plain"
    with pytest.raises(ValueError, match="unsupported date-math"):
        Engine._resolve_snapshot_name("<x-{now/w}>", T0)


def test_retention_expire_bounded_by_min_count(es):
    # take snapshots on 4 consecutive days (day 0 already taken above)
    for d in (1, 2, 3):
        es.execute_slm_policy("nightly", now=T0 + d * DAY)
    # at T0+10d every snapshot is older than 7d, but min_count=2 keeps
    # the two most recent
    out = es.execute_slm_retention(now=T0 + 10 * DAY)
    assert out["deleted"] == ["nightly-2023.11.14", "nightly-2023.11.15"]
    assert not os.path.exists(os.path.join(REPO, "nightly-2023.11.14"))
    assert os.path.isdir(os.path.join(REPO, "nightly-2023.11.17"))
    st = es.get_slm_stats()
    assert st["snapshots_taken"] == 4 and st["snapshots_deleted"] == 2


def test_retention_expiry_then_max_count_trims_oldest(es):
    # the day-3/day-4 survivors expire too once the clock passes their 7d
    for d in (11, 12, 13):
        es.execute_slm_policy("nightly", now=T0 + d * DAY)
    out = es.execute_slm_retention(now=T0 + 13.5 * DAY)
    assert out["deleted"] == ["nightly-2023.11.16", "nightly-2023.11.17"]
    # now grow to 5 live snapshots with nothing expired: max_count=4 must
    # trim exactly the oldest
    for d in (14, 15):
        es.execute_slm_policy("nightly", now=T0 + d * DAY)
    out = es.execute_slm_retention(now=T0 + 15.5 * DAY)
    assert out["deleted"] == ["nightly-2023.11.25"]
    assert not os.path.exists(os.path.join(REPO, "nightly-2023.11.25"))
    assert os.path.isdir(os.path.join(REPO, "nightly-2023.11.29"))


def test_delete_policy_keeps_snapshots(es):
    es.delete_slm_policy("nightly")
    with pytest.raises(ValueError, match="unknown SLM policy"):
        es.get_slm_policy("nightly")
    assert os.path.isdir(os.path.join(REPO, "nightly-2023.11.29"))


def test_retention_min_count_exceeds_total(spark, tmp_path):
    """min_count larger than the number of snapshots keeps ALL of them —
    the negative slice used to delete the oldest anyway."""
    repo = str(tmp_path / "repo")
    os.makedirs(repo)
    eng = Engine(spark, root=str(tmp_path / "root"))
    eng.create_index("keep-a", num_partitions=1)
    eng.bulk("keep-a", _docs(spark, ["k1"]))
    eng.put_slm_policy("few", {
        "schedule": "0 30 1 * * ?", "name": "<few-{now/d}>",
        "repository": repo, "config": {"indices": ["keep-*"]},
        "retention": {"expire_after": "7d", "min_count": 5},
    })
    for d in (0, 1, 2):
        eng.execute_slm_policy("few", now=T0 + d * DAY)
    out = eng.execute_slm_retention(now=T0 + 30 * DAY)
    assert out["deleted"] == []  # all 3 protected by min_count=5
