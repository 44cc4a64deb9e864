"""ILM (x-pack/plugin/ilm, IndexLifecycleService / TimeseriesLifecycleType):
policy registration, hot-phase rollover on max_docs/max_age, warm-phase
readonly + forcemerge after min_age, delete phase, and the injectable clock
that stands in for the reference's poll interval."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine
from elasticsearch_spark.sources import index_store as store

ROOT = "/tmp/es_spark_ilm_test"

POLICY = {
    "phases": {
        "hot": {"actions": {"rollover": {"max_docs": 3, "max_age": "30d"}}},
        "warm": {"min_age": "60s", "actions": {"readonly": {}, "forcemerge": {}}},
        "delete": {"min_age": "120s", "actions": {"delete": {}}},
    }
}


def _docs(spark, urls):
    return spark.createDataFrame(
        [(u, f"text for {u} spark", "en") for u in urls],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))


@pytest.fixture(scope="module")
def es(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    eng = Engine(spark, root=ROOT)
    eng.put_lifecycle_policy("logs-policy", POLICY)
    eng.create_index("logs-000001", num_partitions=2)
    eng.update_aliases([
        {"add": {"alias": "logs", "index": "logs-000001", "is_write_index": True}}
    ])
    eng.apply_lifecycle("logs-000001", "logs-policy", rollover_alias="logs", now=1000.0)
    return eng


def test_policy_validation(es):
    with pytest.raises(ValueError, match="unsupported ILM phases"):
        es.put_lifecycle_policy("bad", {"phases": {"frozen": {}}})
    with pytest.raises(ValueError, match="unsupported ILM actions"):
        es.put_lifecycle_policy("bad", {"phases": {"warm": {"actions": {"shrink": {}}}}})
    with pytest.raises(ValueError, match="unknown ILM policy"):
        es.apply_lifecycle("logs-000001", "nope")


def test_explain_unmanaged(es):
    assert es.explain_lifecycle("other")["managed"] is False


def test_hot_no_rollover_below_conditions(es, spark):
    es.bulk("logs", _docs(spark, ["u1", "u2"]))
    assert es.ilm_step(now=1010.0) == []
    assert es._write_index("logs") == "logs-000001"


def test_hot_rollover_on_max_docs(es, spark):
    es.bulk("logs", _docs(spark, ["u3"]))  # now 3 docs >= max_docs
    actions = es.ilm_step(now=1020.0)
    assert actions == [
        {"index": "logs-000001", "action": "rollover", "new_index": "logs-000002"}
    ]
    assert es._write_index("logs") == "logs-000002"
    # rolled-from index advanced to warm; new index managed in hot
    assert es.explain_lifecycle("logs-000001")["phase"] == "warm"
    assert es.explain_lifecycle("logs-000002")["phase"] == "hot"
    # writes through the alias land in the new generation
    es.bulk("logs", _docs(spark, ["u4"]))
    assert es.count("logs-000002") == 1


def test_warm_waits_for_min_age(es):
    assert es.ilm_step(now=1030.0) == []  # warm min_age 60s not reached
    assert es.explain_lifecycle("logs-000001")["actions_done"] == []


def test_warm_readonly_and_forcemerge(es, spark):
    actions = es.ilm_step(now=1085.0)  # 65s past rollover
    kinds = {(a["index"], a["action"]) for a in actions}
    assert kinds == {("logs-000001", "readonly"), ("logs-000001", "forcemerge")}
    ex = es.explain_lifecycle("logs-000001")
    assert ex["phase"] == "delete"  # advanced after all warm actions ran
    assert ex["readonly"] is True
    assert len(store.list_segs(es._dir("logs-000001"))) == 1  # forcemerged
    with pytest.raises(ValueError, match="read-only"):
        es.bulk("logs-000001", _docs(spark, ["blocked"]))
    # docs survive the warm transition and stay searchable
    assert es.count("logs-000001") == 3


def test_delete_waits_then_drops(es):
    assert es.ilm_step(now=1100.0) == []  # 80s < delete min_age 120s
    actions = es.ilm_step(now=1150.0)
    assert actions == [{"index": "logs-000001", "action": "delete"}]
    assert es.explain_lifecycle("logs-000001")["managed"] is False
    assert "logs-000001" not in es.resolve("logs")
    assert es._write_index("logs") == "logs-000002"


def test_max_age_rollover(es, spark):
    # generation 2 has 1 doc (< max_docs) but ages past max_age=30d
    actions = es.ilm_step(now=1020.0 + 31 * 86400)
    assert {(a["index"], a["action"]) for a in actions} == {
        ("logs-000002", "rollover")
    }
    assert es._write_index("logs") == "logs-000003"


def test_policy_getters_and_move_to_step(es):
    assert es.get_lifecycle_policy("logs-policy") == POLICY
    assert "logs-policy" in es.get_lifecycle_policy()
    with pytest.raises(ValueError, match="unknown ILM policy"):
        es.get_lifecycle_policy("nope")
    # logs-000003 is hot-managed after the max_age rollover; force it to warm
    es.ilm_move_to_step("logs-000002", "warm", now=0.0)
    assert es.explain_lifecycle("logs-000002")["phase"] == "warm"
    with pytest.raises(ValueError, match="not ILM-managed"):
        es.ilm_move_to_step("unmanaged-ix", "warm")
    with pytest.raises(ValueError, match="unknown ILM phase"):
        es.ilm_move_to_step("logs-000002", "frozen")


def test_remove_lifecycle(es):
    assert es.remove_lifecycle_policy("logs-000002")["has_failures"] is False
    assert es.explain_lifecycle("logs-000002")["managed"] is False
    assert es.remove_lifecycle_policy("logs-000002")["failed_indexes"] == ["logs-000002"]


def test_delete_only_policy_advances_from_hot(spark, tmp_path):
    """A policy with no hot rollover action (delete-only) must still move
    the index out of 'hot' on the next phase's min_age — it used to stay
    hot forever."""
    T0, DAY = 1700000000.0, 86400.0
    eng = Engine(spark, root=str(tmp_path))
    eng.create_index("ephemeral", num_partitions=1)
    eng.bulk("ephemeral", _docs(spark, ["e1"]))
    eng.put_lifecycle_policy("purge", {"phases": {
        "delete": {"min_age": "1d", "actions": {"delete": {}}}}})
    eng.apply_lifecycle("ephemeral", "purge", rollover_alias=None, now=T0)
    assert eng.ilm_step(now=T0 + 0.5 * DAY) == []  # too young
    acts = eng.ilm_step(now=T0 + 2 * DAY)
    assert any(a["action"] == "phase:delete" for a in acts)
    acts2 = eng.ilm_step(now=T0 + 4 * DAY)
    assert any(a["action"] == "delete" for a in acts2)
    assert "ephemeral" not in eng.indices()
