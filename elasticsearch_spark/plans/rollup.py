"""Rollup (the reference's ``x-pack/plugin/rollup``): materialized
pre-aggregation of a time-series index + search over the rolled table.

``build_rollup`` = the rollup job (RollupShardIndexer): one groupBy over
(date_histogram bucket × terms keys) storing MERGEABLE partials — min /
max / sum / value_count; ``avg`` is stored as (sum, value_count), exactly
the reference's decomposition, so any coarser re-aggregation stays exact.

``rollup_search`` = TransportRollupSearchAction: a date_histogram (same
or coarser calendar interval) + metric aggs rewritten onto the rolled
table — sums of sums, mins of mins, avg = Σsum/Σcount. The invariant the
tests + oracle check: rollup_search == the same aggregation run directly
on the raw table whenever the intervals nest.

Scale: the rollup table is smaller than the raw data by the bucket ratio;
both the build and the search are single partial/final aggregations."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .transform import cal_unit  # the one shared calendar-interval map


def build_rollup(df: DataFrame, config: dict) -> DataFrame:
    g = config["groups"]
    dh = g["date_histogram"]
    unit = cal_unit(dh.get("calendar_interval", "1h"))
    ts_field = dh["field"]
    keys = [F.date_trunc(unit, F.col(ts_field)).alias(ts_field)]
    for t in (g.get("terms") or {}).get("fields", []):
        keys.append(F.col(t))
    aggs = [F.count("*").alias("_doc_count")]
    for m in config.get("metrics", []):
        f = m["field"]
        wanted = set(m["metrics"])
        if "avg" in wanted:
            wanted |= {"sum", "value_count"}
        for kind in sorted(wanted - {"avg"}):
            fn = {"min": F.min, "max": F.max, "sum": F.sum,
                  "value_count": F.count}[kind]
            aggs.append(fn(F.col(f)).alias(f"{f}.{kind}"))
    return df.groupBy(*keys).agg(*aggs)


def rollup_search(rollup_df: DataFrame, body: dict) -> DataFrame:
    """aggs body (one date_histogram + metric sub-aggs) over the rolled
    table → bucket frame identical to running it on the raw index."""
    (name, spec), = body.items()
    dh = spec["date_histogram"]
    unit = cal_unit(dh.get("calendar_interval", "1d"))
    ts_field = dh["field"]
    key = F.date_trunc(unit, F.col(ts_field)).alias("key")
    cols = [F.sum("_doc_count").alias("doc_count")]
    for sname, sspec in (spec.get("aggs") or {}).items():
        (kind, b), = sspec.items()
        f = b["field"]
        if kind == "sum":
            cols.append(F.sum(F.col(f"`{f}.sum`")).alias(sname))
        elif kind == "min":
            cols.append(F.min(F.col(f"`{f}.min`")).alias(sname))
        elif kind == "max":
            cols.append(F.max(F.col(f"`{f}.max`")).alias(sname))
        elif kind == "value_count":
            cols.append(F.sum(F.col(f"`{f}.value_count`")).alias(sname))
        elif kind == "avg":
            cols.append(
                (F.sum(F.col(f"`{f}.sum`")) / F.sum(F.col(f"`{f}.value_count`"))).alias(sname)
            )
        else:
            raise ValueError(f"rollup_search cannot serve metric: {kind}")
    return rollup_df.groupBy(key).agg(*cols).orderBy("key")


def downsample(
    df: DataFrame,
    time_field: str,
    fixed_interval: str,
    dimensions: list[str],
    metrics: list[str],
) -> DataFrame:
    """TSDB downsampling (the reference's ``_downsample`` API /
    ``x-pack/plugin/downsample`` DownsampleShardIndexer): replace the raw
    index with one document per (_tsid = dimension tuple, time bucket)
    carrying min/max/sum/value_count per metric — the exact mergeable
    partials, so any coarser re-aggregation (or a second downsample pass)
    stays exact, same decomposition as rollup.

    ``fixed_interval`` accepts ``<n>m|h|d`` (fixed units only, like the
    reference — calendar units are rollup's job). One groupBy with
    map-side partials; the _tsid tuple keys the shuffle, so cardinality =
    series count, not row count."""
    import re

    m = re.fullmatch(r"(\d+)([mhd])", fixed_interval)
    if not m:
        raise ValueError(f"fixed_interval must be <n>[mhd]: {fixed_interval}")
    sec = int(m.group(1)) * {"m": 60, "h": 3600, "d": 86400}[m.group(2)]
    bucket = (
        F.floor(F.unix_timestamp(F.col(time_field)) / F.lit(sec)) * sec
    ).cast("long").alias("bucket_ts")
    aggs = [F.count(F.lit(1)).alias("_doc_count")]
    for mt in metrics:
        c = F.col(mt).cast("double")
        aggs += [
            F.min(c).alias(f"{mt}_min"), F.max(c).alias(f"{mt}_max"),
            F.sum(c).alias(f"{mt}_sum"),
            F.count(c).alias(f"{mt}_value_count"),
        ]
    return df.groupBy(*[F.col(d) for d in dimensions], bucket).agg(*aggs)
