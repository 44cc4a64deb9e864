"""geoip ingest processor: bucketed broadcast range join (never a
nested-loop range join), struct target field, malformed-IP null handling."""

from __future__ import annotations

from elasticsearch_spark.sources.geoip import (
    fake_geoip_db,
    geoip_lookup,
    ip_to_long,
    prepare_geoip_blocks,
)
from elasticsearch_spark.sources.ingest_pipeline import run_pipeline


def test_ip_to_long(spark):
    df = spark.createDataFrame(
        [("1.2.3.4",), ("255.255.255.255",), ("bogus",), ("1.2.3",)], "ip string"
    )
    got = [r.n for r in df.select(ip_to_long(df.ip).alias("n")).collect()]
    assert got == [(1 << 24) + (2 << 16) + (3 << 8) + 4, (1 << 32) - 1, None, None]


def test_geoip_lookup_and_processor(spark):
    db = prepare_geoip_blocks(fake_geoip_db(spark))
    df = spark.createDataFrame(
        [(1, "10.0.0.1"), (2, "10.200.0.1"), (3, "not-an-ip")], "id int, ip string"
    )
    out = geoip_lookup(df, "ip", db).orderBy("id").collect()
    # 10.x: bucket 10 → halves C(20%97) / C(21%97)
    assert out[0]["geoip"]["country_iso_code"] == "C20"
    assert out[1]["geoip"]["country_iso_code"] == "C21"
    assert out[2]["geoip"]["country_iso_code"] is None

    # same through the pipeline processor form
    piped = run_pipeline(
        df, [{"geoip": {"field": "ip", "_database_df": fake_geoip_db(spark)}}]
    ).orderBy("id").collect()
    assert piped[0]["geoip"]["country_iso_code"] == "C20"


def test_geoip_plan_is_hash_join(spark):
    """The equi-bucket must make the range join a BroadcastHashJoin —
    a BroadcastNestedLoopJoin would be O(corpus × blocks) at scale."""
    db = prepare_geoip_blocks(fake_geoip_db(spark))
    df = spark.range(100).selectExpr("concat('10.0.0.', cast(id % 200 as string)) as ip")
    plan = geoip_lookup(df, "ip", db)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan
