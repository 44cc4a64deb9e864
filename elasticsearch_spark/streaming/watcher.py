"""Watcher-style streaming alerting: stored queries percolated against a
document STREAM.

The reference's Watcher (``x-pack/plugin/watcher``) evaluates a watch =
(trigger schedule, input search, condition, actions) on the cluster; its
match core over incoming documents is the percolator. The Spark-first
shape: the trigger schedule IS the micro-batch trigger, the input is the
streaming frame itself, and percolation is the same driver-compiled
predicate projection as batch percolate (operators/percolate.py) — a pure
narrow transformation, so it runs under Structured Streaming with zero
shuffle and no state unless a condition needs windowed counts.

Pieces:

- ``percolate_stream``: streaming (query_id, key, ts) alert rows — one
  row per (stored query, matching doc). Append-mode safe (stateless).
- ``threshold_condition``: watch condition ``compare: gte N over window``
  — watermarked windowed count per query_id, emitting only windows whose
  match count crosses the threshold (the ``ctx.payload.hits.total >= N``
  idiom from the reference's watch DSL).
- ``throttle``: per-query alert suppression for a cooldown period
  (ActionWrapper.java's throttle_period) via watermark + dropDuplicates
  on (query_id, cooldown bucket).

At 100 TB/day of stream: percolation cost is per-doc predicate work with
no shuffle; the windowed condition shuffles only (query_id, window) pairs
— cardinality = stored queries × windows, tiny by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.percolate import percolate


def percolate_stream(
    stream: DataFrame,
    stored_queries: list[tuple[str, dict]],
    key: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming percolation: (query_id, key, ts) per stored-query match.

    Works on a streaming frame because batch ``percolate`` compiles the
    stored queries into predicate Columns — a stateless projection the
    streaming planner accepts in append mode. The event-time column rides
    through the projection (keep_cols) so watermarked conditions can
    consume it without a stream-stream join."""
    return percolate(
        stream, stored_queries, key=key, text_col=text_col, keep_cols=[ts_col]
    )


def threshold_condition(
    alerts: DataFrame,
    min_matches: int,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Watch condition: fire once per (query_id, window) when the window's
    match count reaches ``min_matches``. Late rows beyond ``watermark``
    are dropped (the reference evaluates conditions on the trigger's
    payload snapshot — the watermark is the streaming analog)."""
    return (
        alerts.withWatermark(ts_col, watermark)
        .groupBy("query_id", F.window(F.col(ts_col), window).alias("w"))
        .agg(F.count("*").alias("n_matches"))
        .where(F.col("n_matches") >= min_matches)
        .select(
            "query_id",
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_matches",
        )
    )


def throttle(
    alerts: DataFrame,
    period: str = "5 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-query throttling (throttle_period): at most one alert row per
    query_id per ``period`` bucket — watermarked dropDuplicates on the
    (query_id, bucket) pair, the stateless-state-bounded dedup idiom."""
    return (
        alerts.withWatermark(ts_col, watermark)
        .withColumn("__bucket", F.window(F.col(ts_col), period).getField("start"))
        .dropDuplicates(["query_id", "__bucket"])
        .drop("__bucket")
    )


def run_watch(
    stream: DataFrame,
    stored_queries: list[tuple[str, dict]],
    alerts_path: str,
    checkpoint: str,
    key: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ts",
    condition: dict | None = None,
    trigger_seconds: float | None = None,
):
    """Wire a watch end-to-end: percolate the stream, apply the optional
    threshold condition, append alerts to a parquet sink (the reference's
    ``index`` action). Returns the StreamingQuery. Exactly-once via the
    checkpoint (replayed micro-batches rewrite the same alert files)."""
    alerts = percolate_stream(stream, stored_queries, key=key, text_col=text_col, ts_col=ts_col)
    if condition:
        alerts = threshold_condition(
            alerts,
            int(condition.get("min_matches", 1)),
            window=condition.get("window", "1 minute"),
            watermark=condition.get("watermark", "2 minutes"),
            ts_col=ts_col,
        )
    writer = alerts.writeStream.format("parquet").option(
        "path", alerts_path
    ).option("checkpointLocation", checkpoint).outputMode("append")
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
