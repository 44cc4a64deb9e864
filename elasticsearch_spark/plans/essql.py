"""ES SQL — the x-pack SQL access path (``x-pack/plugin/sql``).

Spark already speaks the SQL core, so the translation layer is exactly
the part ES adds on top of standard SQL: the FULLTEXT extensions.

- ``MATCH(field, 'query text')`` → the match query compiled through the
  DSL (plans/dsl.py) into a per-doc BM25 score frame, left-joined onto
  the table as ``_score``; the predicate becomes ``_score IS NOT NULL``.
- ``QUERY('query string syntax')`` → same, through the query_string
  parser (AND/OR/NOT/fields supported there).
- ``SCORE()`` → the ``_score`` column.

Everything else in the statement (projections, WHERE, GROUP BY, ORDER
BY, LIMIT, functions) is handed to Spark SQL verbatim — the dialects
agree on the subset ES SQL supports. One MATCH/QUERY per statement (the
reference allows more; one covers the dominant usage)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_MATCH_RE = re.compile(r"MATCH\(\s*(\w+)\s*,\s*'([^']*)'\s*\)", re.I)
_QUERY_RE = re.compile(r"QUERY\(\s*'([^']*)'\s*\)", re.I)
_SCORE_RE = re.compile(r"SCORE\(\s*\)", re.I)


def es_sql(
    spark: SparkSession,
    tables: dict[str, DataFrame],
    query: str,
    key: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Run an ES-SQL statement over named frames."""
    from . import dsl

    m = _MATCH_RE.search(query)
    qm = _QUERY_RE.search(query)
    body = None
    if m:
        fld, text = m.groups()
        body = {"match": {fld: text}}
    elif qm:
        body = {"query_string": {"query": qm.group(1)}}

    out_sql = query
    for name, df in tables.items():
        if body is not None:
            node = dsl.parse(body)
            ctx = dsl.SearchContext(df, key, text_col=text_col)
            fr = node.frame(ctx).select(F.col("__key").alias(key), "_score")
            df = df.join(fr, key, "left")
        df.createOrReplaceTempView(name)
    if body is not None:
        out_sql = _MATCH_RE.sub("(_score IS NOT NULL)", out_sql)
        out_sql = _QUERY_RE.sub("(_score IS NOT NULL)", out_sql)
        out_sql = _SCORE_RE.sub("_score", out_sql)
    return spark.sql(out_sql)
