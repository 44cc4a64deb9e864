"""Percolator: reverse search (alerting) — which STORED queries match each
incoming document.

The reference keeps queries indexed in a percolator field and, per incoming
document, builds an in-memory index of that one document and runs the
candidate queries against it
(``modules/percolator/src/main/java/org/elasticsearch/percolator/
PercolateQueryBuilder.java``, ``PercolatorFieldMapper.java``). The Spark-first
shape inverts the cardinality: documents are the big side (a stream/batch
frame), stored queries are the SMALL side — so the stored queries are
compiled ONCE on the driver into predicate Columns (the DSL's filter-context
compilation, ``plans/dsl.py``) and evaluated as a single wide projection over
the documents frame: one scan, zero shuffle, every predicate JVM-side
whole-stage-codegen. This is the broadcast-join analog of the reference's
candidate-query pre-filtering (its MemoryIndex step is unnecessary — Spark
already has the document columns in memory).

At 100 TB: cost is O(docs × matched-predicate-work) with no shuffle; tens of
thousands of stored queries chunk into multiple projections (``chunk_size``)
to keep codegen happy, still one pass per chunk over the cached frame.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans import dsl


def percolate(
    docs: DataFrame,
    stored_queries: list[tuple[str, dict]] | DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 200,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """(query_id, doc key [, keep_cols...]) pairs for every stored query
    matching each doc. ``keep_cols`` ride through the projection (needed
    by streaming callers, where a post-hoc join back to the stream would
    be a stream-stream join).

    stored_queries: [(query_id, query_dict)] or a DataFrame(query_id,
    query_json) — the stored-query side is small by design (alerting
    rules), so it is collected and compiled driver-side; the documents
    side is never collected.

    Queries evaluate in FILTER context (unscored), the percolator's
    matching semantics."""
    if isinstance(stored_queries, DataFrame):
        rows = [
            (r["query_id"], json.loads(r["query_json"]))
            for r in stored_queries.collect()
        ]
    else:
        rows = [(qid, q if isinstance(q, dict) else json.loads(q)) for qid, q in stored_queries]

    ctx = dsl.SearchContext(docs, key, text_col=text_col)
    out: DataFrame | None = None
    for i in range(0, len(rows), chunk_size):
        chunk = rows[i : i + chunk_size]
        hit_ids = F.array_compact(F.array(*[
            F.when(F.coalesce(dsl.parse(q).predicate(ctx), F.lit(False)), F.lit(qid))
            for qid, q in chunk
        ]))
        extra = [F.col(c) for c in (keep_cols or [])]
        part = (
            docs.select(F.col(key), *extra, hit_ids.alias("__qids"))
            .where(F.size("__qids") > 0)
            .select(F.explode("__qids").alias("query_id"), F.col(key), *extra)
        )
        out = part if out is None else out.unionByName(part)
    if out is None:
        # empty stored-query list → empty result with the same schema;
        # where(lit(False)) instead of limit(0) because limit is not
        # supported on STREAMING frames (percolate_stream/run_watch hit
        # this branch whenever a watch list is currently empty)
        return docs.where(F.lit(False)).select(
            F.lit("").alias("query_id"), F.col(key), *[F.col(c) for c in (keep_cols or [])]
        )
    return out
