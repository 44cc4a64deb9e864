"""Span-query family (operators/spans.py): evaluator unit tests + the
distributed index path through Engine.search."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine
from elasticsearch_spark.operators.spans import SpanNode, _eval_spans, parse_span

ROOT = "/tmp/es_spark_test_spans"


def n(kind, **kw):
    return SpanNode(kind, **kw)


def term(t):
    return SpanNode("term", term=t)


class TestEvalSpans:
    POS = {"a": [0, 5, 9], "b": [1, 7], "c": [3]}

    def test_term(self):
        assert _eval_spans(term("a"), self.POS) == [(0, 0), (5, 5), (9, 9)]

    def test_or(self):
        out = _eval_spans(n("or", clauses=[term("b"), term("c")]), self.POS)
        assert out == [(1, 1), (3, 3), (7, 7)]

    def test_near_ordered(self):
        node = n("near", clauses=[term("a"), term("b")], slop=0, in_order=True)
        # a@0 → b@1 adjacent; a@5 → b@7 gap 1 > slop 0; a@9 → none
        assert _eval_spans(node, self.POS) == [(0, 1)]
        node2 = n("near", clauses=[term("a"), term("b")], slop=1, in_order=True)
        assert _eval_spans(node2, self.POS) == [(0, 1), (5, 7)]

    def test_near_unordered(self):
        node = n("near", clauses=[term("b"), term("a")], slop=0, in_order=False)
        assert (0, 1) in _eval_spans(node, self.POS)

    def test_first(self):
        node = n("first", clauses=[term("b")], end=2)
        assert _eval_spans(node, self.POS) == [(1, 1)]

    def test_not(self):
        # a-spans not adjacent-before a b: exclude = near(a,b) spans (0,1),(5,7 w/ slop)
        exc = n("near", clauses=[term("a"), term("b")], slop=0, in_order=True)
        node = n("not", clauses=[term("a"), exc])
        assert _eval_spans(node, self.POS) == [(5, 5), (9, 9)]

    def test_containing_within(self):
        big = n("near", clauses=[term("a"), term("c")], slop=5, in_order=True)
        assert _eval_spans(big, self.POS) == [(0, 3)]
        cont = n("containing", clauses=[big, term("b")])
        assert _eval_spans(cont, self.POS) == [(0, 3)]  # contains b@1
        within = n("within", clauses=[term("b"), big])
        assert _eval_spans(within, self.POS) == [(1, 1)]

    def test_parse_tree(self):
        node = parse_span({"span_first": {
            "match": {"span_or": {"clauses": [
                {"span_term": {"text": "x"}},
                {"span_term": {"text": {"value": "y"}}},
            ]}},
            "end": 3,
        }})
        assert node.kind == "first" and node.end == 3
        assert {c.term for c in node.clauses[0].clauses} == {"x", "y"}


@pytest.fixture(scope="module")
def es(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    eng = Engine(spark, root=ROOT)
    eng.create_index("pages", num_partitions=2)
    docs = spark.createDataFrame(
        [
            ("u1", "spark makes distributed computing simple and fun", "en"),
            ("u2", "distributed systems need careful computing design", "en"),
            ("u3", "computing without spark is distributed pain", "en"),
            ("u4", "simple spark programs compute quickly", "en"),
        ],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
    eng.bulk("pages", docs)
    return eng


def test_span_first_index(es):
    body = {"query": {"span_first": {
        "match": {"span_term": {"text": "distributed"}}, "end": 3}}, "size": 5}
    # 'distributed' within the first 3 positions: u1 (pos 2), u2 (pos 0)
    assert {r["url"] for r in es.search("pages", body)["hits"].collect()} == {"u1", "u2"}


def test_span_not_index(es):
    body = {"query": {"span_not": {
        "include": {"span_term": {"text": "computing"}},
        "exclude": {"span_near": {
            "clauses": [{"span_term": {"text": "distributed"}},
                        {"span_term": {"text": "computing"}}],
            "slop": 0, "in_order": True}},
    }}, "size": 5}
    # 'computing' not immediately after 'distributed': u2, u3 (u1's is adjacent)
    assert {r["url"] for r in es.search("pages", body)["hits"].collect()} == {"u2", "u3"}


def test_span_containing_index(es):
    body = {"query": {"span_containing": {
        "big": {"span_near": {
            "clauses": [{"span_term": {"text": "spark"}},
                        {"span_term": {"text": "computing"}}],
            "slop": 3, "in_order": True}},
        "little": {"span_term": {"text": "distributed"}},
    }}, "size": 5}
    # spark..computing window containing 'distributed': only u1
    assert {r["url"] for r in es.search("pages", body)["hits"].collect()} == {"u1"}


def test_span_multi_prefix_index(es):
    body = {"query": {"span_near": {
        "clauses": [
            {"span_multi": {"match": {"prefix": {"text": {"value": "comput"}}}}},
            {"span_term": {"text": "design"}},
        ],
        "slop": 0, "in_order": True}}, "size": 5}
    # computing|compute + adjacent 'design': u2 only
    assert {r["url"] for r in es.search("pages", body)["hits"].collect()} == {"u2"}


def test_span_or_scoring_deterministic(es):
    body = {"query": {"span_or": {"clauses": [
        {"span_term": {"text": "spark"}},
        {"span_term": {"text": "distributed"}},
    ]}}, "size": 10}
    rows = es.search("pages", body)["hits"].collect()
    assert {r["url"] for r in rows} == {"u1", "u2", "u3", "u4"}
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


class TestFieldMaskingAndGap:
    POS = {"a": [0, 5, 9], "b": [1, 7], "c": [3]}

    def test_field_masking_is_identity_over_single_stream(self):
        masked = parse_span({"span_near": {"clauses": [
            {"span_term": {"body": "a"}},
            {"span_field_masking": {"query": {"span_term": {"title": "b"}}, "field": "body"}},
        ], "slop": 0, "in_order": True}})
        plain = parse_span({"span_near": {"clauses": [
            {"span_term": {"body": "a"}}, {"span_term": {"body": "b"}},
        ], "slop": 0, "in_order": True}})
        assert _eval_spans(masked, self.POS) == _eval_spans(plain, self.POS)

    def test_span_gap_grants_exact_positions(self):
        # a _ c : gap of 1 between a and c → a@0..c@3 needs 2 free (gap 1 + slop 1)
        node = parse_span({"span_near": {"clauses": [
            {"span_term": {"body": "a"}},
            {"span_gap": {"body": 1}},
            {"span_term": {"body": "c"}},
        ], "slop": 1, "in_order": True}})
        assert _eval_spans(node, self.POS) == [(0, 3)]
        # slop 0: a@0..c@3 has 2 intervening positions but gap only grants 1 → no match
        node0 = parse_span({"span_near": {"clauses": [
            {"span_term": {"body": "a"}},
            {"span_gap": {"body": 1}},
            {"span_term": {"body": "c"}},
        ], "slop": 0, "in_order": True}})
        assert _eval_spans(node0, self.POS) == []
        # the gap must FIT: adjacent a@0,b@1 can't host it, but a@5 x b@7 can
        adj = parse_span({"span_near": {"clauses": [
            {"span_term": {"body": "a"}},
            {"span_gap": {"body": 1}},
            {"span_term": {"body": "b"}},
        ], "slop": 0, "in_order": True}})
        assert _eval_spans(adj, self.POS) == [(5, 7)]

    def test_span_gap_unordered_rejected(self):
        node = parse_span({"span_near": {"clauses": [
            {"span_term": {"body": "a"}},
            {"span_gap": {"body": 1}},
            {"span_term": {"body": "b"}},
        ], "slop": 2, "in_order": False}})
        with pytest.raises(ValueError, match="in_order"):
            _eval_spans(node, self.POS)
