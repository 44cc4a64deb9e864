"""Streaming deduplication — the ingest-time dedup stage of an LLM data
pipeline (drop exact duplicates as documents ARRIVE, before they ever cost
index/tokenize work downstream).

Spark-first shape: content-hash + ``dropDuplicates`` is Structured
Streaming's built-in stateful exact dedup — the state store keeps one
compact hash key per distinct document ever seen and the semantics are
first-arrival-wins across micro-batches and restarts (state rides the
checkpoint). With an event-time watermark the state is bounded:
``dropDuplicatesWithinWatermark`` expires keys older than the horizon —
the right trade for crawl streams where re-fetches cluster in time.

Near-duplicate streaming dedup is deliberately NOT stateful-streaming
here: MinHash/SimHash candidate joins need corpus-wide bucket state that
belongs in the batch/compaction layer (operators/dedup.py) — run it over
each refreshed segment set instead, like the reference runs merges.

At 10^12 docs: state is hash-partitioned across executors by key (RocksDB
state store in production), per-batch work is one narrow projection + the
state lookup; no shuffle beyond the dedup key exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream(
    stream: DataFrame,
    content_col: str = "text",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    normalize: bool = True,
) -> DataFrame:
    """Exact-content streaming dedup. Returns the stream with duplicate
    documents dropped (first arrival wins).

    - ``ts_col`` None → unbounded state (every distinct content hash ever
      seen is remembered — exact forever, state grows with distinct docs).
    - ``ts_col`` set → ``dropDuplicatesWithinWatermark``: duplicates are
      only suppressed within the watermark horizon; state is bounded.

    ``normalize`` lowercases + collapses whitespace before hashing (the
    usual crawl-dedup canonicalization); the emitted rows keep the
    original content either way.
    """
    c = F.col(content_col)
    if normalize:
        c = F.regexp_replace(F.lower(c), r"\s+", " ")
    out = stream.withColumn("__h", F.md5(c))
    if ts_col is None:
        return out.dropDuplicates(["__h"]).drop("__h")
    out = out.withWatermark(ts_col, watermark)
    return out.dropDuplicatesWithinWatermark(["__h"]).drop("__h")
