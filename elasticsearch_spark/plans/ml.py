"""Anomaly detection core (x-pack ml subset).

Reference surface: x-pack/plugin/ml anomaly-detection jobs
(``x-pack/plugin/core/src/main/java/org/elasticsearch/xpack/core/ml/job/config/Detector.java``,
``AnalysisConfig.java``): a job buckets a time series by ``bucket_span``,
applies a detector function (count / mean / min / max / sum /
distinct_count) optionally split by ``partition_field_name``, and emits
anomaly records whose ``record_score`` reflects how far the bucket value
sits from the modelled typical value.

Documented subset: the reference models buckets with online
mixture/seasonal models (the C++ ml-cpp process). This engine replaces
the model with a ROBUST BATCH BASELINE — per-partition median as the
typical value and the scaled MAD (median absolute deviation × 1.4826,
the consistency constant for a normal distribution) as the dispersion —
so the score is a robust z-score. That is the standard batch analog:
deterministic, exactly reproducible in ANSI SQL (the driver oracle), and
distributed as two groupBys (bucketize, then per-partition quantiles).
No online state, no seasonality — documented, not hidden.

Scale shape: one shuffle on (partition, bucket) for the detector
aggregation (partial map-side combine), one on partition for the
baseline quantiles; bucket counts are bounded by time-range/span so the
second aggregation is coordinator-small even at 10^12 input rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FUNCTIONS = {"count", "distinct_count", "mean", "avg", "sum", "min", "max"}


def anomaly_detect(
    df: DataFrame,
    time_field: str,
    bucket_span: int,
    function: str = "count",
    field: str | None = None,
    partition_field: str | None = None,
    threshold: float = 3.0,
) -> DataFrame:
    """Bucketed robust-z anomaly records.

    Returns one row per (partition, bucket):
    ``(partition?, bucket_ts, actual, typical, score, is_anomaly)`` where
    ``bucket_ts`` is the bucket start in epoch seconds, ``typical`` the
    per-partition median bucket value, and ``score`` the robust z
    ``|actual - typical| / (1.4826 * MAD)``.
    """
    if function not in _FUNCTIONS:
        raise ValueError(f"unsupported detector function: {function}")
    if function in ("count", "distinct_count"):
        agg = (
            F.count(F.lit(1)) if function == "count"
            else F.countDistinct(F.col(field))
        ).cast("double")
    else:
        if field is None:
            raise ValueError(f"detector function {function} requires a field")
        fn = {"mean": F.avg, "avg": F.avg, "sum": F.sum, "min": F.min, "max": F.max}[function]
        agg = fn(F.col(field).cast("double"))

    bucket = (
        F.floor(F.unix_timestamp(F.col(time_field)) / F.lit(bucket_span)) * bucket_span
    ).cast("long").alias("bucket_ts")
    keys = ([F.col(partition_field)] if partition_field else []) + [bucket]
    buckets = df.groupBy(*keys).agg(agg.alias("actual"))

    part_keys = [partition_field] if partition_field else []
    med = buckets.groupBy(*part_keys).agg(
        F.expr("percentile(actual, 0.5)").alias("__med")
    )
    joined = buckets.join(F.broadcast(med), part_keys) if part_keys else buckets.crossJoin(med)
    mad = joined.groupBy(*part_keys).agg(
        F.expr("percentile(abs(actual - __med), 0.5)").alias("__mad")
    )
    scored = joined.join(F.broadcast(mad), part_keys) if part_keys else joined.crossJoin(mad)

    z = F.abs(F.col("actual") - F.col("__med")) / (F.lit(1.4826) * F.col("__mad") + F.lit(1e-9))
    out_cols = part_keys + ["bucket_ts"]
    return (
        scored.select(
            *out_cols,
            F.round("actual", 6).alias("actual"),
            F.round("__med", 6).alias("typical"),
            F.round(z, 6).alias("score"),
            (z >= F.lit(float(threshold))).alias("is_anomaly"),
        )
        .orderBy(*out_cols)
    )
