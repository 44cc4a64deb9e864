"""Continuous transform — the streaming half of x-pack transform.

The reference's continuous transforms (``x-pack/plugin/transform/src/main/
java/org/elasticsearch/xpack/transform/transforms/TransformIndexer.java``)
re-run the pivot over documents newer than a checkpoint and upsert changed
buckets into the dest index. Under Structured Streaming the same contract is
native: a file stream over an APPEND-ONLY source directory, a stateful
streaming aggregation (Spark keeps the per-bucket partials in the state
store), and a `complete`-mode foreachBatch sink that atomically replaces the
dest table with the full up-to-date pivot each micro-batch. The checkpoint
directory IS the transform checkpoint: a restart resumes from the last
processed files and the state store, so each source FILE is aggregated
exactly once.

Source contract: the glob must be append-only — new files only. Pointing it
at a compacting directory (e.g. index segments that a forcemerge rewrites)
double-counts merged docs, and tombstoned deletes are never retracted (the
partials are additive — the same restriction the reference puts on
continuous-mode ingest timestamps). Stream the ingest staging directory or a
dedicated append log, not the post-merge segment store.

Scale notes: the streaming aggregation shuffles once per micro-batch on the
group keys (same as the batch pivot); state size = number of buckets ×
partial width (mergeable partials only — sum/count/avg/min/max, the same
restriction the reference imposes on continuous-mode aggs). The dest
overwrite is bucket-frame-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def transform_continuous(
    spark: SparkSession,
    source_glob: str,
    schema,
    dest_path: str,
    pivot: dict,
    checkpoint: str,
) -> dict:
    """Run one availableNow cycle of a continuous pivot transform.

    pivot = {"group_by": {name: {terms|histogram|date_histogram: ...}},
             "aggregations": {name: {avg|sum|min|max|value_count: {field}}}}
    (the mergeable subset — streaming state must be an algebraic partial).
    Re-invoking with the same checkpoint processes only NEW source files.
    """
    from ..plans import aggs as aggs_mod

    stream = spark.readStream.schema(schema).parquet(source_glob)
    keys = []
    for name, gspec in pivot["group_by"].items():
        c, _ = aggs_mod._bucket_col(gspec)
        keys.append((c if hasattr(c, "alias") else F.col(c)).alias(name))
    grouped = aggs_mod._apply_metric_subaggs(
        stream.groupBy(*keys), pivot.get("aggregations"), df=stream
    )

    def sink(batch_df, _bid):
        batch_df.write.mode("overwrite").parquet(dest_path)

    q = (
        grouped.writeStream.outputMode("complete")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import os

    if not os.path.exists(dest_path):
        # no source files yet → no micro-batch fired, dest never written
        return {"dest": dest_path, "buckets": 0}
    n = spark.read.parquet(dest_path).count()
    return {"dest": dest_path, "buckets": n}
