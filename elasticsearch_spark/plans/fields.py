"""Field-type layer: mapper semantics beyond plain scalar columns.

The reference's mappers give each field type its own index representation
and query behavior; here each becomes a typed-column convention plus query
helpers over it:

- range fields (``integer_range``/``date_range``/…): a struct column
  ``{gte, lte}`` queried with a relation (INTERSECTS / WITHIN / CONTAINS)
  — ``server/src/main/java/org/elasticsearch/index/mapper/RangeFieldMapper.java``,
  relation semantics ``RangeType.java`` (dvRangeQuery) and
  ``index/query/RangeQueryBuilder.java`` (``relation`` parameter).
- flattened: one JSON object indexed as a single map — keyed access
  ``field.key`` for term/terms/prefix/exists/range —
  ``x-pack/plugin/core/.../flattened/FlattenedFieldMapper.java``.
- token_count: analyzer token count indexed as an integer subfield —
  ``modules/mapper-extras/.../TokenCountFieldMapper.java``.
- match_only_text: text indexed DOCS-only with norms omitted; match
  queries score tf=1 / norm=1, so per-term BM25 collapses to
  ``idf * (k1+1)*1/(1+k1*1) = idf`` — a pure sum-of-idf ranking —
  ``modules/mapper-extras/.../MatchOnlyTextFieldMapper.java`` (phrase
  queries re-verify positions from _source; our positional path already
  does exactly that).
- aggregate_metric_double: a pre-aggregated struct ``{min, max, sum,
  value_count}``; metric aggs read the matching subfield and avg derives
  as sum/value_count —
  ``x-pack/plugin/mapper-aggregate-metric/.../AggregateDoubleMetricFieldMapper.java``.
- version: semver-ordered keyword — sort key encodes numeric dotted parts
  fixed-width so lexicographic order == version order, pre-release ranks
  below the release — ``x-pack/plugin/mapper-version/.../VersionStringFieldMapper.java``.
- time_series agg: one bucket per ``_tsid`` (the tuple of dimension
  fields), ordered by tsid —
  ``server/.../search/aggregations/timeseries/TimeSeriesAggregationBuilder.java``.

All helpers are pure Column expressions / DataFrame plans — nothing here
leaves the JVM, every filter is Catalyst-pushable.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd  # noqa: F401 — pandas_udf type hints resolve via module globals

from pyspark.sql import Column, DataFrame, functions as F

from elasticsearch_spark.plans.dsl import Leaf, Node, SearchContext

# ---------------------------------------------------------------------------
# range fields
# ---------------------------------------------------------------------------

RELATIONS = ("intersects", "within", "contains")


def range_struct(gte: Column | str, lte: Column | str) -> Column:
    """Build a range-field value (the struct convention used everywhere)."""
    g = F.col(gte) if isinstance(gte, str) else gte
    l = F.col(lte) if isinstance(lte, str) else lte
    return F.struct(g.alias("gte"), l.alias("lte"))


def range_relation_pred(fld: str, gte, lte, relation: str = "intersects") -> Column:
    """Predicate for a range QUERY over a range FIELD (both are intervals).

    RangeType.java dvRangeQuery semantics (closed bounds):
      INTERSECTS: f.gte <= q.lte AND f.lte >= q.gte
      WITHIN:     field interval lies inside the query interval
      CONTAINS:   field interval encloses the query interval
    """
    f_gte, f_lte = F.col(f"{fld}.gte"), F.col(f"{fld}.lte")
    # missing bounds are UNBOUNDED (±inf), never NULL comparisons (which
    # would null the predicate and match nothing): a None query bound means
    # the clause is open on that side; a NULL stored bound means the FIELD
    # interval is open there (RangeType.java encodes absent bounds as
    # MIN/MAX sentinels — null-struct-field is this engine's spelling)
    no_lo, no_hi = f_gte.isNull(), f_lte.isNull()
    q_lo = F.lit(gte) if gte is not None else None
    q_hi = F.lit(lte) if lte is not None else None
    true = F.lit(True)
    if relation == "intersects":
        lo_ok = true if q_hi is None else (no_lo | (f_gte <= q_hi))
        hi_ok = true if q_lo is None else (no_hi | (f_lte >= q_lo))
        return lo_ok & hi_ok
    if relation == "within":
        lo_ok = true if q_lo is None else ((~no_lo) & (f_gte >= q_lo))
        hi_ok = true if q_hi is None else ((~no_hi) & (f_lte <= q_hi))
        return lo_ok & hi_ok
    if relation == "contains":
        lo_ok = no_lo if q_lo is None else (no_lo | (f_gte <= q_lo))
        hi_ok = no_hi if q_hi is None else (no_hi | (f_lte >= q_hi))
        return lo_ok & hi_ok
    raise ValueError(f"unknown relation {relation!r}; expected one of {RELATIONS}")


@dataclass
class RangeFieldQ(Leaf):
    """``range`` query against a range field with a ``relation``."""

    gte: object = None
    lte: object = None
    relation: str = "intersects"

    def predicate(self, ctx: SearchContext) -> Column:
        return range_relation_pred(self.fld, self.gte, self.lte, self.relation)


# ---------------------------------------------------------------------------
# flattened fields
# ---------------------------------------------------------------------------


def flattened_col(json_col: str | Column) -> Column:
    """Parse a JSON-object column into the flattened map representation.

    The reference indexes every leaf as ``key\\0value`` keyword terms under
    one field; a ``map<string,string>`` gives the same keyed + root access.
    """
    c = F.col(json_col) if isinstance(json_col, str) else json_col
    return F.from_json(c, "map<string,string>")


@dataclass
class FlattenedQ(Node):
    """term/terms/prefix/exists/range over ``field.key`` of a flattened
    field (keyed access), or term over any value (root access, key=None).

    The source column may be the raw JSON string (parsed per-query — fine,
    from_json is codegen'd) or an already-materialized map column.
    """

    fld: str = ""
    key: str | None = None
    op: str = "term"  # term | terms | prefix | exists | range
    value: object = None
    values: list = field(default_factory=list)
    gte: object = None
    lte: object = None
    boost: float = 1.0

    def _map(self, ctx: SearchContext) -> Column:
        dtype = dict(ctx.df.dtypes).get(self.fld, "")
        return F.col(self.fld) if dtype.startswith("map") else flattened_col(self.fld)

    def predicate(self, ctx: SearchContext) -> Column:
        m = self._map(ctx)
        if self.key is None:  # root access: any leaf value matches
            vals = F.map_values(m)
            if self.op == "term":
                return F.array_contains(vals, str(self.value))
            if self.op == "exists":
                return m.isNotNull() & (F.size(vals) > 0)
            raise ValueError(f"root flattened access supports term/exists, not {self.op}")
        v = m.getItem(self.key)
        if self.op == "term":
            return v == F.lit(str(self.value))
        if self.op == "terms":
            return v.isin([str(x) for x in self.values])
        if self.op == "prefix":
            return v.startswith(str(self.value))
        if self.op == "exists":
            return v.isNotNull()
        if self.op == "range":
            # flattened values are keywords: numeric bounds compare
            # numerically, string bounds lexicographically (ref behavior)
            def _num(x):
                try:
                    float(x)
                    return True
                except (TypeError, ValueError):
                    return False

            numeric = all(_num(x) for x in (self.gte, self.lte) if x is not None)
            vv = v.cast("double") if numeric else v
            p = F.lit(True)
            if self.gte is not None:
                p = p & (vv >= (float(self.gte) if numeric else str(self.gte)))
            if self.lte is not None:
                p = p & (vv <= (float(self.lte) if numeric else str(self.lte)))
            return p
        raise ValueError(f"unknown flattened op {self.op!r}")


# ---------------------------------------------------------------------------
# token_count field
# ---------------------------------------------------------------------------


def token_count_col(text_col: str | Column, analyzer_regex: str = "[a-z0-9]+") -> Column:
    """token_count mapper: number of analyzer tokens (positionIncrements)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(analyzer_regex), F.lit(0)))


# ---------------------------------------------------------------------------
# match_only_text
# ---------------------------------------------------------------------------


@dataclass
class MatchOnlyTextQ(Node):
    """match over a match_only_text field: DOCS-only postings → tf treated
    as 1, norms omitted → per-term score = idf; doc score = Σ idf over
    matched query terms (operator/minimum_should_match as in match).
    """

    text: str = ""
    operator: str = "or"
    minimum_should_match: int = 0
    boost: float = 1.0

    def frame(self, ctx: SearchContext) -> DataFrame:
        terms = list(dict.fromkeys(ctx.analyze(self.text)))
        if not terms:
            return ctx.df.select(F.col(ctx.key).alias("__key")).limit(0).withColumn(
                "_score", F.lit(0.0)
            )
        # presence per (doc, term) — tf collapses to 1 (DOCS-only postings)
        q = ctx.tf().where(F.col("term").isin(terms)).select("__key", "term")
        dfstats = q.groupBy("term").agg(F.count("*").cast("double").alias("df"))
        n_match = len(terms) if self.operator == "and" else max(1, self.minimum_should_match)
        scored = (
            q.join(F.broadcast(dfstats), "term")
            .crossJoin(F.broadcast(ctx.coll().select("n_docs")))
            .withColumn(
                "idf", F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            )
            .groupBy("__key")
            .agg(
                (F.sum("idf") * self.boost).alias("_score"),
                F.count("*").cast("int").alias("_matched"),
            )
        )
        return scored.where(F.col("_matched") >= n_match).drop("_matched")


# ---------------------------------------------------------------------------
# aggregate_metric_double
# ---------------------------------------------------------------------------

_AMD_SUBFIELDS = ("min", "max", "sum", "value_count")


def aggregate_metric_struct(min_c, max_c, sum_c, count_c) -> Column:
    """Build an aggregate_metric_double value from partial columns."""
    cols = [F.col(c) if isinstance(c, str) else c for c in (min_c, max_c, sum_c, count_c)]
    return F.struct(
        cols[0].cast("double").alias("min"),
        cols[1].cast("double").alias("max"),
        cols[2].cast("double").alias("sum"),
        cols[3].cast("long").alias("value_count"),
    )


def aggregate_metric_agg(fld: str, metric: str) -> Column:
    """Resolve a metric agg over an aggregate_metric_double field.

    AggregateDoubleMetricFieldMapper routes each agg to its subfield:
    min→min(f.min), max→max(f.max), sum→sum(f.sum),
    value_count→sum(f.value_count), avg→sum(f.sum)/sum(f.value_count).
    Re-aggregation is exact because the partials are mergeable.
    """
    if metric == "min":
        return F.min(F.col(f"{fld}.min"))
    if metric == "max":
        return F.max(F.col(f"{fld}.max"))
    if metric == "sum":
        return F.sum(F.col(f"{fld}.sum"))
    if metric == "value_count":
        return F.sum(F.col(f"{fld}.value_count"))
    if metric == "avg":
        return F.sum(F.col(f"{fld}.sum")) / F.sum(F.col(f"{fld}.value_count"))
    raise ValueError(
        f"aggregate_metric_double supports min/max/sum/value_count/avg, not {metric!r}"
    )


# ---------------------------------------------------------------------------
# unsigned_long field (x-pack mapper-unsigned-long)
# ---------------------------------------------------------------------------

_U63 = 9223372036854775808  # 2^63


def unsigned_long_encode(col: str | Column) -> Column:
    """uint64 (decimal(20,0)/string) → the reference's SHIFTED signed-long
    doc value: stored = value ^ 2^63, i.e. value − 2^63 as signed arithmetic
    (UnsignedLongFieldMapper.java:635 ``value ^ MASK_2_63``). Signed order
    over the shifted longs == unsigned order over the originals, so native
    long sort/range/min/max work unchanged — the whole point of the mapper."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(20,0)") - F.lit(str(_U63)).cast("decimal(20,0)")).cast("long")


def unsigned_long_decode(col: str | Column) -> Column:
    """Shifted signed long → the uint64 value as decimal(20,0) (the
    sortableSignedLongToUnsigned round-trip for _source/fields output)."""
    c = F.col(col) if isinstance(col, str) else col
    return (c.cast("decimal(20,0)") + F.lit(str(_U63)).cast("decimal(20,0)")).cast("decimal(20,0)")


def unsigned_long_range_pred(fld: str | Column, gte: int | str | None = None,
                             lte: int | str | None = None) -> Column:
    """Range predicate over a SHIFTED unsigned_long column: the uint64
    bounds are shifted driver-side (plain Python ints), so the comparison
    stays a native long predicate that pushes to the parquet scan."""
    c = F.col(fld) if isinstance(fld, str) else fld
    pred = F.lit(True)
    if gte is not None:
        pred = pred & (c >= F.lit(int(gte) - _U63))
    if lte is not None:
        pred = pred & (c <= F.lit(int(lte) - _U63))
    return pred


# ---------------------------------------------------------------------------
# constant_keyword field (x-pack mapper-constant-keyword)
# ---------------------------------------------------------------------------


def constant_keyword_matches(constant: str | None, kind: str, spec) -> bool:
    """Resolve a query against a constant_keyword field ENTIRELY from the
    mapping constant — no data access (ConstantKeywordFieldMapper.java:
    termQuery/wildcardQuery/existsQuery evaluate against the constant and
    return MatchAllDocsQuery or MatchNoDocsQuery). At scale this is the
    index-pruning fast path: a mismatching filter skips the whole index.

    Returns True → the query is match_all for this index; False → match_none.
    """
    import fnmatch
    import re as _re

    if kind == "exists":
        return constant is not None
    if constant is None:
        return False
    if kind == "term":
        v = spec["value"] if isinstance(spec, dict) else spec
        return str(v) == constant
    if kind == "terms":
        return any(str(v) == constant for v in spec)
    if kind == "prefix":
        v = spec["value"] if isinstance(spec, dict) else spec
        return constant.startswith(str(v))
    if kind == "wildcard":
        v = spec["value"] if isinstance(spec, dict) else spec
        return fnmatch.fnmatchcase(constant, str(v))
    if kind == "regexp":
        v = spec["value"] if isinstance(spec, dict) else spec
        return _re.fullmatch(str(v), constant) is not None
    if kind == "range":
        lo, hi = spec.get("gte"), spec.get("lte")
        ok = True
        if lo is not None:
            ok = ok and constant >= str(lo)
        if hi is not None:
            ok = ok and constant <= str(hi)
        return ok
    raise ValueError(f"constant_keyword does not support {kind!r} queries")


# ---------------------------------------------------------------------------
# version field
# ---------------------------------------------------------------------------


def version_sort_key(col: str | Column) -> Column:
    """Encode a semver-ish string so lexicographic order == version order.

    Dotted numeric parts are zero-padded to 10 digits; a release sorts
    AFTER its pre-releases (``1.0.0-alpha < 1.0.0``), matching the
    reference's encoding contract (VersionStringFieldMapper: "Sorts
    correctly by version order").
    """
    c = F.col(col) if isinstance(col, str) else col
    core = F.split(c, "-", 2).getItem(0)
    pre = F.get(F.split(c, "-", 2), 1)  # NULL when no prerelease tag
    pad = lambda p: F.when(p.rlike("^[0-9]+$"), F.lpad(p, 10, "0")).otherwise(p)
    pad_parts = lambda x: F.array_join(
        # numeric identifiers compare numerically (semver rule 11.4):
        # zero-pad digit-only parts; alphanumeric parts stay verbatim
        F.transform(F.split(x, r"\."), pad),
        ".",
    )
    # the CORE pads to a fixed 8 parts (+ a part-count tiebreak) so a
    # version that is a dotted prefix of a longer one ("1.0" vs "1.0.1")
    # compares inside the numeric parts — with variable-length cores the
    # '|' separator (0x7C > '.') sorted the SHORTER version after the
    # longer. Cores beyond 8 parts truncate (tie-broken by part count).
    core_parts = F.transform(F.split(core, r"\."), pad)
    core_fixed = F.slice(
        F.concat(core_parts, F.array_repeat(F.lit("0000000000"), 8)), 1, 8
    )
    padded = F.concat(
        F.array_join(core_fixed, "."),
        F.lit("."),
        F.lpad(F.size(core_parts).cast("string"), 2, "0"),
    )
    # '~' (0x7E) > any pre-release tag char → releases rank above pre-releases
    return F.concat(padded, F.lit("|"), F.coalesce(pad_parts(pre), F.lit("~")))


# ---------------------------------------------------------------------------
# time_series aggregation
# ---------------------------------------------------------------------------


def time_series_agg(
    df: DataFrame, dimensions: list[str], metrics: dict[str, Column] | None = None
) -> DataFrame:
    """``time_series`` agg: one bucket per _tsid = the dimension tuple.

    TimeSeriesAggregator walks docs in (tsid, timestamp) order and emits a
    bucket per tsid with doc_count (+ sub-aggs). Spark: groupBy on the
    dimension columns — the shuffle key IS the tsid, so a TSDB-partitioned
    table (partitionBy(dimensions)) aggregates with zero extra movement.
    Output: one row per tsid, dimension columns + doc_count + metrics,
    ordered by the tsid tuple (the reference's bucket order).
    """
    aggs = [F.count("*").alias("doc_count")]
    for name, expr in (metrics or {}).items():
        aggs.append(expr.alias(name))
    return df.groupBy(*dimensions).agg(*aggs).orderBy(*dimensions)


# ---------------------------------------------------------------------------
# geo_shape FIELD type: stored GeoJSON shapes
# ---------------------------------------------------------------------------

def with_shape_bbox(df: DataFrame, fld: str) -> DataFrame:
    """Index-time enrichment for a stored geo_shape column (GeoJSON string):
    adds flat ``<fld>_minx/_miny/_maxx/_maxy`` double columns. Flat doubles
    land in parquet row-group stats, so the query-time bbox prefilter
    prunes at the scan — the BKD-tree-prefilter analog
    (``GeoShapeFieldMapper.java`` indexes tessellated triangles into a BKD
    for the same purpose)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("struct<minx:double,miny:double,maxx:double,maxy:double>")
    def bb(s: pd.Series) -> pd.DataFrame:
        from elasticsearch_spark.functions.geometry import geojson_bbox

        rows = []
        for v in s:
            b = geojson_bbox(v) if v is not None else None
            rows.append(b if b else (None, None, None, None))
        return pd.DataFrame(rows, columns=["minx", "miny", "maxx", "maxy"])

    tmp = f"__bb_{fld}"
    out = df.withColumn(tmp, bb(F.col(fld)))
    for part in ("minx", "miny", "maxx", "maxy"):
        out = out.withColumn(f"{fld}_{part}", F.col(f"{tmp}.{part}"))
    return out.drop(tmp)


def shape_relate_col(df: DataFrame, fld: str, shape: dict, relation: str) -> Column:
    """geo_shape query over a STORED shape column
    (``GeoShapeQueryBuilder.java`` with relation intersects / disjoint /
    within / contains): a JVM-side bbox prefilter over the flat
    ``<fld>_minx…`` columns (when present — pushes to parquet stats) ANDed
    with the exact planar relate kernel (functions/geometry.py) over only
    the prefilter survivors."""
    import json as _json

    from pyspark.sql.functions import pandas_udf

    from ..functions.geometry import geom_bbox, parse_geojson

    qgeom = parse_geojson(shape)
    qminx, qminy, qmaxx, qmaxy = geom_bbox(qgeom)
    qjson = _json.dumps(shape)
    rel = relation

    @pandas_udf("boolean")
    def exact(s: pd.Series) -> pd.Series:
        from elasticsearch_spark.functions.geometry import parse_geojson as pg
        from elasticsearch_spark.functions.geometry import relate as rl

        q = pg(qjson)
        out = []
        for v in s:
            if v is None:
                out.append(False)
                continue
            try:
                out.append(bool(rl(pg(v), q, rel)))
            except Exception:  # noqa: BLE001 — malformed stored shape ≠ match
                out.append(False)
        return pd.Series(out)

    exact_pred = exact(F.col(fld))
    have_bbox = all(f"{fld}_{p}" in df.columns
                    for p in ("minx", "miny", "maxx", "maxy"))
    if not have_bbox:
        return exact_pred
    minx, miny = F.col(f"{fld}_minx"), F.col(f"{fld}_miny")
    maxx, maxy = F.col(f"{fld}_maxx"), F.col(f"{fld}_maxy")
    overlap = (minx <= qmaxx) & (maxx >= qminx) & (miny <= qmaxy) & (maxy >= qminy)
    if rel == "intersects":
        return overlap & exact_pred
    if rel == "disjoint":
        # non-overlapping bboxes are disjoint without the exact test;
        # overlapping ones fall through to the kernel (which evaluates
        # NOT intersects itself)
        return (~overlap) | exact_pred
    if rel == "within":
        inside = (minx >= qminx) & (maxx <= qmaxx) & (miny >= qminy) & (maxy <= qmaxy)
        return inside & exact_pred
    if rel == "contains":
        covers = (minx <= qminx) & (maxx >= qmaxx) & (miny <= qminy) & (maxy >= qmaxy)
        return covers & exact_pred
    raise ValueError(f"unsupported geo_shape relation: {rel}")
