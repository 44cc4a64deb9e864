"""Watcher-style streaming alerting: percolate a document stream against
stored queries, windowed threshold condition, per-query throttling."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from elasticsearch_spark.streaming import watcher

WATCH_DIR = "/tmp/es_spark_watch_test"

QUERIES = [
    ("q_fox", {"match": {"text": "fox"}}),
    ("q_err", {"bool": {"must": [{"match": {"text": "error"}},
                                 {"term": {"lang": "en"}}]}}),
    ("q_none", {"match": {"text": "zzzznothing"}}),
]


def _docs_pdf():
    rows = []
    base = pd.Timestamp("2024-01-01 00:00:00")
    texts = [
        ("d1", "the quick brown fox", "en", 0),
        ("d2", "error while reading fox burrow", "en", 10),
        ("d3", "error again", "en", 20),
        ("d4", "error yet again", "en", 30),
        ("d5", "nothing to see", "de", 70),
        ("d6", "fox error", "de", 80),  # q_err needs lang=en: no match
    ]
    for key, text, lang, sec in texts:
        rows.append({"doc_id": key, "text": text, "lang": lang,
                     "ts": base + pd.Timedelta(seconds=sec)})
    return pd.DataFrame(rows)


@pytest.fixture(scope="module")
def watch_src(spark):
    shutil.rmtree(WATCH_DIR, ignore_errors=True)
    src = f"{WATCH_DIR}/src"
    spark.createDataFrame(_docs_pdf()).coalesce(1).write.parquet(f"{src}/a")
    # a later arrival far in the future: advances the watermark so the
    # first batch's event-time windows close and append-mode aggregates emit
    pusher = pd.DataFrame([{
        "doc_id": "d_late", "text": "fox pushes the watermark", "lang": "en",
        "ts": pd.Timestamp("2024-01-01 02:00:00"),
    }])
    spark.createDataFrame(pusher).coalesce(1).write.parquet(f"{src}/b")
    return src


def test_percolate_stream_alerts(spark, watch_src):
    schema = spark.read.parquet(f"{watch_src}/a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{watch_src}/*")
    )
    alerts = watcher.percolate_stream(stream, QUERIES, key="doc_id")
    assert alerts.isStreaming
    q = (
        alerts.writeStream.format("memory").queryName("w_alerts")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r["query_id"], r["doc_id"])
           for r in spark.sql("select * from w_alerts").collect()}
    assert got == {
        ("q_fox", "d1"), ("q_fox", "d2"), ("q_fox", "d6"), ("q_fox", "d_late"),
        ("q_err", "d2"), ("q_err", "d3"), ("q_err", "d4"),
    }
    # ts rides through for downstream watermarking
    assert "ts" in spark.sql("select * from w_alerts").columns


def test_threshold_condition_fires_per_window(spark, watch_src):
    schema = spark.read.parquet(f"{watch_src}/a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{watch_src}/*")
    )
    alerts = watcher.percolate_stream(stream, QUERIES, key="doc_id")
    fired = watcher.threshold_condition(alerts, min_matches=2, window="1 minute")
    q = (
        fired.writeStream.format("memory").queryName("w_fired")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from w_fired").collect()
    # window [00:00, 01:00): q_fox matches d1,d2 (2) and q_err d2,d3,d4 (3);
    # window [01:00, 02:00): q_fox only d6 (1 < 2) — suppressed
    got = {(r["query_id"], str(r["window_start"]), r["n_matches"]) for r in rows}
    assert got == {
        ("q_fox", "2024-01-01 00:00:00", 2),
        ("q_err", "2024-01-01 00:00:00", 3),
    }


def test_throttle_one_alert_per_period(spark, watch_src):
    schema = spark.read.parquet(f"{watch_src}/a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{watch_src}/*")
    )
    alerts = watcher.percolate_stream(stream, QUERIES, key="doc_id")
    calm = watcher.throttle(alerts, period="1 minute")
    q = (
        calm.writeStream.format("memory").queryName("w_calm")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from w_calm").collect()
    per = {}
    for r in rows:
        bucket = r["ts"].replace(second=0)
        per.setdefault((r["query_id"], bucket), 0)
        per[(r["query_id"], bucket)] += 1
    assert all(v == 1 for v in per.values())
    # q_err fires once despite 3 matches in the same minute
    assert sum(1 for (qid, _b) in per if qid == "q_err") == 1


def test_run_watch_end_to_end(spark, watch_src):
    schema = spark.read.parquet(f"{watch_src}/a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{watch_src}/*")
    )
    out, ckpt = f"{WATCH_DIR}/alerts", f"{WATCH_DIR}/ckpt"
    q = watcher.run_watch(stream, QUERIES, out, ckpt)
    q.processAllAvailable()
    q.stop()
    got = spark.read.parquet(out)
    assert got.count() == 7
    assert set(got.columns) == {"query_id", "doc_id", "ts"}


def test_percolate_stream_empty_watch_list(spark, watch_src):
    """An empty stored-query list must produce an EMPTY alert stream —
    the old docs.limit(0) fallback raised (limit is unsupported on
    streaming Datasets) at writeStream.start()."""
    schema = spark.read.parquet(f"{watch_src}/a").schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{watch_src}/*")
    )
    alerts = watcher.percolate_stream(stream, [], key="doc_id")
    assert alerts.isStreaming
    q = (
        alerts.writeStream.format("memory").queryName("w_empty")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    assert spark.sql("select * from w_empty").count() == 0
