"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship — full engine path (analyzer → postings/segment
  build → block-max WAND BM25 top-k → fetch) over the sf0.001 documents table.
- ``queries()`` / ``oracle_sql()``: the operator registry
  (elasticsearch_spark/registry.py), each Spark DataFrame implementation
  paired with an equivalent DuckDB-runnable ANSI-SQL oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elasticsearch_spark import registry  # noqa: E402


def _docs_as_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents(doc_id, text, lang, …) → pages(url, warc_ts, text, lang)
    shape the index build expects; url = zero-padded doc_id so lexicographic
    url order == numeric doc order (deterministic internal doc ids)."""
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.format_string("doc%012d", F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.col("text"),
        F.col("lang"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Build the inverted index over sf0.001 documents, run a disjunctive
    BM25 top-10 with block-max WAND, fetch the source rows.

    analyzer="regex_simple" ([a-z0-9]+ over lowercased text) is deliberate:
    the driver's DuckDB oracle must mirror tokenization exactly in SQL, and
    regex_simple is the one analyzer with a byte-identical SQL twin
    (regexp_extract_all). The standard UAX#29 analyzer is exercised by the
    pytest golden suite (tests/test_analysis.py, tests/test_goldens.py)
    and the index-path tests instead."""
    from elasticsearch_spark.operators.postings import build_index
    from elasticsearch_spark.operators.topk import search_topk

    sf_dir = "/root/testdata/sf0.001"
    index_dir = "/tmp/es_spark_entry_index"
    build_index(spark, _docs_as_pages(spark, sf_dir), index_dir, num_partitions=4,
                analyzer="regex_simple")
    hits = search_topk(spark, index_dir, ["spark", "merge", "vector"], k=10, mode="wand")
    return hits.select(
        F.col("url"), F.col("lang"), F.round("score", 4).alias("score")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
