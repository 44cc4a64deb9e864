"""Percolator (reverse search): stored queries evaluated as predicate
columns over the documents frame — one scan, no shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators.percolate import percolate


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark joins data", "en", 100),
        (2, "slow batch job", "en", 400),
        (3, "spark streaming fast", "de", 250),
        (4, "nothing relevant", "fr", 50),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, n_chars int").cache()


def test_percolate_matches_stored_queries(spark, corpus):
    stored = [
        ("q_spark", {"match": {"text": "spark"}}),
        ("q_en_long", {"bool": {"filter": [
            {"term": {"lang": "en"}},
            {"range": {"n_chars": {"gte": 200}}}]}}),
        ("q_none", {"term": {"lang": "zh"}}),
    ]
    got = {(r["query_id"], r["doc_id"]) for r in percolate(corpus, stored).collect()}
    assert got == {("q_spark", 1), ("q_spark", 3), ("q_en_long", 2)}


def test_percolate_queries_dataframe_form(spark, corpus):
    import json

    qdf = spark.createDataFrame(
        [("q1", json.dumps({"wildcard": {"text": {"value": "*stream*"}}}))],
        "query_id string, query_json string",
    )
    got = {(r["query_id"], r["doc_id"]) for r in percolate(corpus, qdf).collect()}
    assert got == {("q1", 3)}


def test_percolate_chunking(spark, corpus):
    stored = [(f"q{i}", {"term": {"doc_id": i % 4 + 1}}) for i in range(10)]
    got = percolate(corpus, stored, chunk_size=3).collect()
    assert len(got) == 10  # every query matches exactly its one doc
    assert all(int(r["query_id"][1:]) % 4 + 1 == r["doc_id"] for r in got)


def test_percolate_no_queries(spark, corpus):
    assert percolate(corpus, []).count() == 0


def test_percolate_query_kind(spark, tmp_path):
    """The percolate QUERY kind (PercolateQueryBuilder, modules/percolator
    10_basic.yml): a search against the queries index returns the stored
    queries the candidate document matches — inline document and
    index/id-referenced document forms."""
    import json

    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path / "pq"))
    es.create_index("queries_index", num_partitions=1)
    es.bulk("queries_index", spark.createDataFrame(
        [("q1", "placeholder", "en", json.dumps({"match_all": {}})),
         ("q2", "placeholder", "en",
          json.dumps({"term": {"color": {"value": "blue"}}}))],
        "url string, text string, lang string, query string"))
    out = es.search("queries_index", {"query": {"percolate": {
        "field": "query", "document": {"color": "red", "text": "x"}}}})
    assert sorted(r["url"] for r in out["hits"].collect()) == ["q1"]
    out = es.search("queries_index", {"query": {"percolate": {
        "field": "query", "document": {"color": "blue", "text": "x"}}}})
    assert sorted(r["url"] for r in out["hits"].collect()) == ["q1", "q2"]
    # by reference (percolate existing document)
    es.create_index("documents_index", num_partitions=1)
    es.bulk("documents_index", spark.createDataFrame(
        [("d1", "some text", "en", "blue")],
        "url string, text string, lang string, color string"))
    out = es.search("queries_index", {"query": {"percolate": {
        "field": "query", "index": "documents_index", "id": "d1"}}})
    assert sorted(r["url"] for r in out["hits"].collect()) == ["q1", "q2"]
