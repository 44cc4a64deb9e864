"""Transforms (the reference's ``x-pack/plugin/transform``): entity-centric
materialization of a source index into a destination table, batch or
continuous.

Two flavors, mirroring the reference's ``TransformConfig``:

- **pivot** (``x-pack/plugin/core/src/main/java/org/elasticsearch/xpack/
  core/transform/transforms/pivot/PivotConfig.java``): composite-style
  ``group_by`` (terms / histogram / date_histogram) + metric aggregations,
  one row per entity in the destination.
- **latest** (``.../transforms/latest/LatestConfig.java``): the newest
  document per ``unique_key`` tuple ordered by the ``sort`` field.

Continuous mode follows the reference's ``TransformIndexer`` change-detection
semantics exactly: a checkpoint records the high-water mark of the sync
field; on the next run the indexer finds the *entities touched* by documents
newer than the checkpoint, re-aggregates ONLY those entities over the full
source, and upserts them into the destination (``TransformIndexer.java``'s
changed-bucket query + dest upsert). That makes every agg exact — including
non-mergeable ones like cardinality — while the incremental cost is
proportional to the number of changed entities, not the source size.

Scale: pivot is one partial/final groupBy keyed by the entity tuple;
``apply_checkpoint`` touches new rows (sync-field pushdown-filtered scan →
distinct keys, broadcast-sized when entities change slowly) plus a semi-join
re-aggregation of the changed slice; the dest upsert is an anti-join + union
on the entity key. No driver-side state beyond the checkpoint scalar.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the ES calendar_interval vocabulary (Rounding.DateTimeUnit) → date_trunc
# unit — the ONE shared map (plans/rollup.py imports it; two hand-maintained
# copies had already drifted, with rollup missing 1w/1M/1y/quarter)
_CAL_UNIT = {"1m": "minute", "minute": "minute", "1h": "hour", "hour": "hour",
             "1d": "day", "day": "day", "1w": "week", "week": "week",
             "1M": "month", "month": "month", "1q": "quarter",
             "quarter": "quarter", "1y": "year", "year": "year"}


def cal_unit(interval: str) -> str:
    """calendar_interval → date_trunc unit, with a descriptive error."""
    try:
        return _CAL_UNIT[interval]
    except KeyError:
        raise ValueError(
            f"unsupported calendar_interval {interval!r}; expected one of "
            f"{sorted(_CAL_UNIT)}") from None


def _group_col(spec: dict) -> Column:
    (kind, body), = spec.items()
    field = body["field"]
    if kind == "terms":
        return F.col(field)
    if kind == "histogram":
        iv = float(body["interval"])
        return F.floor(F.col(field) / F.lit(iv)) * F.lit(iv)
    if kind == "date_histogram":
        if "calendar_interval" in body:
            return F.date_trunc(_CAL_UNIT[body["calendar_interval"]],
                                F.col(field))
        m = re.fullmatch(r"(\d+)([smhd])", body["fixed_interval"])
        if not m:
            raise ValueError(f"bad fixed_interval: {body['fixed_interval']}")
        sec = int(m.group(1)) * {"s": 1, "m": 60, "h": 3600, "d": 86400}[m.group(2)]
        return F.timestamp_seconds(
            F.floor(F.unix_timestamp(F.col(field)) / F.lit(sec)) * sec
        )
    raise ValueError(f"unsupported group_by kind: {kind}")


def _agg_col(name: str, spec: dict) -> Column:
    (kind, body), = spec.items()
    c = F.col(body["field"]) if "field" in body else None
    if kind == "avg":
        return F.avg(c).alias(name)
    if kind == "sum":
        return F.sum(c).alias(name)
    if kind == "min":
        return F.min(c).alias(name)
    if kind == "max":
        return F.max(c).alias(name)
    if kind == "value_count":
        return F.count(c).cast("long").alias(name)
    if kind == "cardinality":
        # exact (the reference's HLL is approximate; exactness documented)
        return F.countDistinct(c).cast("long").alias(name)
    raise ValueError(f"unsupported pivot aggregation: {kind}")


def pivot(df: DataFrame, config: dict) -> DataFrame:
    """Run the pivot function over the (already filtered) source frame.

    ``config`` = the ``pivot`` section of a TransformConfig:
    ``{"group_by": {name: {terms|histogram|date_histogram: {...}}, ...},
    "aggregations": {name: {avg|sum|min|max|value_count|cardinality:
    {"field": f}}, ...}}``.
    """
    keys = [_group_col(s).alias(n) for n, s in config["group_by"].items()]
    aggs = [_agg_col(n, s) for n, s in config["aggregations"].items()]
    # composite sources default missing_bucket=false: docs without a group
    # field are SKIPPED (CompositeValuesSourceConfig). Also load-bearing for
    # continuous mode — the dest upsert's anti-join can't match null keys,
    # so a null bucket would duplicate on every checkpoint.
    src = df
    for k in keys:
        src = src.where(k.isNotNull())
    return src.groupBy(*keys).agg(*aggs)


def latest(df: DataFrame, config: dict) -> DataFrame:
    """Latest function: newest row per ``unique_key`` tuple by ``sort``
    (``LatestConfig.java``). Implemented as ``max_by(struct(<row>),
    struct(sort, <tie-break>))`` — a single partial/final groupBy, no
    global window sort. Ties on the sort value break on the remaining
    columns (the reference leaves ties unspecified; deterministic here)."""
    from pyspark.sql.types import MapType

    keys = list(config["unique_key"])
    sort = config["sort"]
    rest = [c for c in df.columns if c not in keys]
    # backtick every name (dotted columns are routine here — the ingest
    # processors emit them) and keep unorderable map columns OUT of the
    # tie-break struct (they still travel in the payload)
    unorderable = {f.name for f in df.schema.fields if isinstance(f.dataType, MapType)}
    order_cols = [sort] + [c for c in rest if c != sort and c not in unorderable]
    bt = lambda c: f"`{c}`"
    out = df.groupBy(*[F.col(bt(k)) for k in keys]).agg(
        F.expr(
            f"max_by(struct({', '.join(bt(c) for c in rest)}),"
            f" struct({', '.join(bt(c) for c in order_cols)}))"
        ).alias("_latest")
    )
    return out.select(
        *[F.col(bt(k)) for k in keys],
        *[F.col(f"_latest.{bt(c)}").alias(c) for c in rest],
    )


def changed_entities(source: DataFrame, config: dict, sync_field: str,
                     last_checkpoint) -> DataFrame:
    """Distinct entity keys touched since the checkpoint — the reference's
    changed-bucket detection (``TransformIndexer`` composite query over
    ``sync.time.field > checkpoint``). Pushdown-filtered scan → distinct.
    Keys come back under ``__gk_<name>`` so derived keys (date buckets,
    histogram bins) never collide with source column names."""
    keys = [_group_col(s).alias(f"__gk_{n}")
            for n, s in config["group_by"].items()]
    newer = source.where(F.col(sync_field) > F.lit(last_checkpoint))
    return newer.select(*keys).distinct()


def apply_checkpoint(source: DataFrame, dest: DataFrame | None, config: dict,
                     sync_field: str, last_checkpoint) -> tuple[DataFrame, object]:
    """One continuous-mode checkpoint cycle: detect changed entities,
    re-aggregate exactly those over the full source, upsert into dest.
    Returns (new_dest, new_checkpoint). ``dest=None`` bootstraps (full
    pivot), matching the reference's first checkpoint."""
    new_max = source.agg(F.max(sync_field)).collect()[0][0]
    if dest is None or last_checkpoint is None:
        return pivot(source, config), new_max
    changed = changed_entities(source, config, sync_field, last_checkpoint)
    names = list(config["group_by"].keys())
    gk = [f"__gk_{n}" for n in names]
    # rows belonging to changed entities: derive the key tuple per row, then
    # semi-join against the (broadcast-small) changed-entity set
    keyed = source.select(
        *source.columns,
        *[_group_col(s).alias(f"__gk_{n}")
          for n, s in config["group_by"].items()],
    )
    slice_ = keyed.join(F.broadcast(changed), gk, "left_semi").drop(*gk)
    recomputed = pivot(slice_, config)
    kept = dest.join(
        F.broadcast(changed.toDF(*names)), names, "left_anti"
    )
    return kept.unionByName(recomputed), new_max
