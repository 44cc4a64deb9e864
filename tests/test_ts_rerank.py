"""text_similarity_reranker retriever (x-pack
TextSimilarityRankRetrieverBuilder): inner-retriever desugar, rank-window
cut, pluggable scorer with the deterministic lexical default."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.plans import dsl


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark engine with distributed query planning"),
        (2, "distributed planning for spark query engines at scale"),
        (3, "spark only briefly mentioned"),
        (4, "cats and dogs living together"),
        (5, "query planning query planning query planning"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _search(corpus, body):
    return dsl.search(corpus.sparkSession, corpus, body)


def test_rerank_orders_by_overlap(corpus):
    body = {
        "retriever": {
            "text_similarity_reranker": {
                "retriever": {"standard": {"query": {"match": {"text": "spark"}}}},
                "field": "text",
                "inference_text": "distributed query planning engine",
                "rank_window_size": 10,
            }
        },
        "size": 10,
    }
    hits = _search(corpus, body).collect()
    ids = [r["doc_id"] for r in hits]
    # docs 1/2 contain all four rerank tokens -> score 1.0; doc 3 only ~0
    assert set(ids[:2]) == {1, 2}
    assert ids[-1] == 3
    assert hits[0]["_score"] == 1.0
    # doc 4 never matched the inner retriever -> absent
    assert 4 not in ids


def test_rank_window_cuts_candidates(corpus):
    body = {
        "retriever": {
            "text_similarity_reranker": {
                "retriever": {"standard": {"query": {"match_all": {}}}},
                "field": "text",
                "inference_text": "cats and dogs",
                "rank_window_size": 2,
            }
        },
        "size": 10,
    }
    hits = _search(corpus, body).collect()
    assert len(hits) == 2  # only the window is reranked and returned


def test_registered_scorer_wins(corpus):
    dsl.register_rerank_scorer(
        "my-model", lambda doc_col, text: F.length(doc_col).cast("double")
    )
    try:
        body = {
            "retriever": {
                "text_similarity_reranker": {
                    "retriever": {"standard": {"query": {"match_all": {}}}},
                    "field": "text",
                    "inference_id": "my-model",
                    "inference_text": "ignored by this scorer",
                    "rank_window_size": 10,
                }
            },
            "size": 10,
        }
        hits = _search(corpus, body).collect()
        lengths = [len(r["text"]) for r in hits]
        assert lengths == sorted(lengths, reverse=True)
    finally:
        dsl.RERANK_SCORERS.pop("my-model", None)


def test_lexical_scorer_bounds(corpus):
    c = corpus.withColumn(
        "s", dsl.lexical_overlap_scorer(F.col("text"), "spark nonexistentword")
    )
    vals = {r["doc_id"]: r["s"] for r in c.collect()}
    assert vals[1] == 0.5  # one of two tokens present
    assert vals[4] == 0.0
