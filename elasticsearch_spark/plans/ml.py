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

from pyspark.sql import DataFrame, Window
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


def outlier_detection(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    *,
    k: int = 5,
    centroids=None,
) -> DataFrame:
    """Data frame analytics outlier detection (``x-pack/plugin/ml``
    ``dataframe/analyses/OutlierDetection.java``): per-point outlier scores
    from k-nearest-neighbor geometry. The reference's native process
    ensembles distance-based and density-based methods; this implements the
    same published methods exactly —

    - ``dist_kth_nn``: distance to the k-th nearest neighbor,
    - ``dist_knn``: mean distance to the k nearest neighbors,
    - ``lof``: Local Outlier Factor (Breunig et al. 2000) with
      reachability distances computed from the same k-NN sets,

    and combines them as ``outlier_score`` = mean of each method's
    cumulative-distribution rank (the reference normalizes method scores to
    [0,1] before ensembling; CDF-rank is the deterministic batch analog —
    documented, not hidden).

    ``centroids``: optional c×dim list. When given, k-NN is computed WITHIN
    the nearest-centroid cluster (euclidean assignment over a literal
    centroid array — JVM transform, no UDF, no shuffle), bounding the
    pairwise join to O(cluster²) — the 100 TB shape, same recipe as
    SemDeDup. When None the frame is one cluster (exact global k-NN —
    matching the reference, whose analytics frame must fit one node).

    Shuffles: one on cluster id for the pair join, one on ``id_col`` for
    the per-point aggregations; the neighbor table is N×k rows. Ties in
    distance break on neighbor id (deterministic, oracle-mirrorable).
    """
    dot = (
        "aggregate(zip_with({a}, {b}, (x, y) -> (x - y) * (x - y)),"
        " cast(0 as double), (s, x) -> s + x)"
    )
    base = df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__v")
    )
    if centroids is not None:
        cents = [list(map(float, c)) for c in centroids]
        cent_lit = F.array(*[F.array(*[F.lit(v) for v in c]) for c in cents])
        d2 = dot.format(a="c", b="__v")
        base = base.withColumn("__cents", cent_lit).withColumn(
            "__cluster",
            F.expr(
                f"array_position(transform(__cents, c -> {d2}),"
                f" array_min(transform(__cents, c -> {d2}))) - 1"
            ).cast("int"),
        ).drop("__cents")
    else:
        base = base.withColumn("__cluster", F.lit(0))

    a = base.select(
        F.col("__id").alias("a"), F.col("__v").alias("va"), "__cluster"
    )
    b = base.select(
        F.col("__id").alias("b"), F.col("__v").alias("vb"), "__cluster"
    )
    pairs = a.join(b, "__cluster").where(F.col("a") != F.col("b")).withColumn(
        "dist", F.expr("sqrt(" + dot.format(a="va", b="vb") + ")")
    ).select("__cluster", "a", "b", "dist")

    w = Window.partitionBy("a").orderBy(F.asc("dist"), F.asc("b"))
    knn = pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)

    per = knn.groupBy("__cluster", "a").agg(
        F.max("dist").alias("dist_kth_nn"),
        F.avg("dist").alias("dist_knn"),
    )
    # LOF: reach_dist(a,b) = max(dist(a,b), kdist(b)); lrd = 1/avg(reach);
    # lof(a) = avg over neighbors b of lrd(b)/lrd(a)
    kdist = per.select(F.col("a").alias("b"), F.col("dist_kth_nn").alias("kdist_b"))
    lrd = (
        knn.join(kdist, "b")
        .groupBy("a")
        .agg((F.lit(1.0) / F.avg(F.greatest("dist", "kdist_b"))).alias("lrd"))
    )
    lrd_b = lrd.select(F.col("a").alias("b"), F.col("lrd").alias("lrd_b"))
    lof = (
        knn.join(lrd_b, "b")
        .groupBy("a")
        .agg(F.avg("lrd_b").alias("__avg_lrd_b"))
        .join(lrd, "a")
        .select("a", (F.col("__avg_lrd_b") / F.col("lrd")).alias("lof"))
    )
    scored = per.join(lof, "a")
    # a point alone in its cluster has no pairs and would vanish from the
    # output — the reference scores EVERY row, and the most isolated point
    # is the most outlier-like. Re-attach singletons with infinite
    # distances so the CDF ranks put them at the top.
    singletons = (
        base.select(F.col("__id").alias("a"), "__cluster")
        .join(scored.select("a"), "a", "left_anti")
        .withColumn("dist_kth_nn", F.lit(float("inf")))
        .withColumn("dist_knn", F.lit(float("inf")))
        .withColumn("lof", F.lit(float("inf")))
    )
    scored = scored.select("a", "__cluster", "dist_kth_nn", "dist_knn", "lof").unionByName(singletons)
    score = (
        F.cume_dist().over(Window.orderBy("dist_kth_nn"))
        + F.cume_dist().over(Window.orderBy("dist_knn"))
        + F.cume_dist().over(Window.orderBy("lof"))
    ) / 3.0
    return scored.select(
        F.col("a").alias(id_col),
        F.col("__cluster").alias("cluster"),
        "dist_kth_nn",
        "dist_knn",
        "lof",
        score.alias("outlier_score"),
    )
