"""Named queries (_name / SearchHit.matchedQueries): every hit lists which
named subqueries it matched; names are stripped before compilation."""

from __future__ import annotations

import pytest

from elasticsearch_spark.plans import dsl
from elasticsearch_spark.plans.dsl import _collect_named


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark streaming engine", "en", 10),
        (2, "spark batch planner", "de", 50),
        (3, "quiet afternoon", "en", 90),
        (4, "cats on keyboards", "fr", 70),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, n long")


def test_collect_named_shapes():
    named: list = []
    q = {
        "bool": {
            "must": [{"match": {"text": {"query": "spark", "_name": "has_spark"}}}],
            "filter": [{"range": {"n": {"lt": 80, "_name": "small_n"}}}],
            "should": [{"term": {"lang": {"value": "en", "_name": "english"}}}],
            "_name": "whole",
        }
    }
    clean = _collect_named(q, named)
    assert "_name" not in str(clean)
    names = [n for n, _ in named]
    assert set(names) == {"has_spark", "small_n", "english", "whole"}
    # the recorded subqueries are runnable (name-free) query dicts
    for _, sub in named:
        assert "_name" not in str(sub)


def test_matched_queries_per_hit(corpus):
    body = {
        "query": {
            "bool": {
                "must": [{"match": {"text": {"query": "spark", "_name": "has_spark"}}}],
                "should": [{"term": {"lang": {"value": "en", "_name": "english"}}}],
            }
        },
        "size": 10,
    }
    hits = dsl.search(corpus.sparkSession, corpus, body).collect()
    mq = {r["doc_id"]: sorted(r["matched_queries"]) for r in hits}
    assert mq[1] == ["english", "has_spark"]
    assert mq[2] == ["has_spark"]
    assert 3 not in mq and 4 not in mq


def test_no_names_no_column(corpus):
    hits = dsl.search(
        corpus.sparkSession, corpus,
        {"query": {"term": {"lang": "en"}}, "size": 10},
    )
    assert "matched_queries" not in hits.columns


def test_scoring_only_named_query(corpus):
    # a match (scoring) named query uses frame membership, not a predicate
    body = {
        "query": {"match": {"text": {"query": "spark cats", "_name": "any_term"}}},
        "size": 10,
    }
    hits = dsl.search(corpus.sparkSession, corpus, body).collect()
    assert all(r["matched_queries"] == ["any_term"] for r in hits)
    assert {r["doc_id"] for r in hits} == {1, 2, 4}


def test_sliced_search_disjoint_exhaustive(corpus):
    body = lambda i: {
        "query": {"match_all": {}},
        "slice": {"id": i, "max": 2},
        "size": 100,
    }
    s0 = {r["doc_id"] for r in dsl.search(corpus.sparkSession, corpus, body(0)).collect()}
    s1 = {r["doc_id"] for r in dsl.search(corpus.sparkSession, corpus, body(1)).collect()}
    assert s0 & s1 == set()
    assert s0 | s1 == {1, 2, 3, 4}
