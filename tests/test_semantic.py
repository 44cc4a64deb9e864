"""semantic_text field + semantic query (x-pack inference,
SemanticTextFieldMapper / SemanticQueryBuilder): deterministic hash
embedder default, pluggable inference registry, ingest embed step, cosine
query through the DSL path."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.functions.inference import (
    INFERENCE_MODELS,
    embed_column,
    embed_text,
    hash_embed,
    register_inference,
)
from elasticsearch_spark.plans import dsl


def test_hash_embed_deterministic_and_normalized():
    a1, a2 = hash_embed(["spark query engine"])[0], hash_embed(["spark query engine"])[0]
    assert a1 == a2
    assert math.isclose(sum(x * x for x in a1), 1.0, rel_tol=1e-9)
    assert hash_embed([""])[0] == [0.0] * 64


def test_hash_embed_similarity_orders_by_overlap():
    q = embed_text("distributed spark query")
    near = embed_text("spark query planning")
    far = embed_text("cats purring softly")

    def cos(u, v):
        return sum(a * b for a, b in zip(u, v))

    assert cos(q, near) > cos(q, far)


def test_registered_model_wins():
    register_inference("toy", lambda texts: [[1.0, 0.0] for _ in texts])
    try:
        assert embed_text("anything", "toy") == [1.0, 0.0]
    finally:
        INFERENCE_MODELS.pop("toy", None)


def test_embed_column_and_semantic_query(spark):
    rows = [
        (1, "spark engine distributed query planning"),
        (2, "query planning on spark"),
        (3, "gardening tips for spring flowers"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, body string")
    emb = embed_column(df, "body")
    assert "body__embedding" in emb.columns
    v = emb.collect()[0]["body__embedding"]
    assert len(v) == 64 and math.isclose(sum(x * x for x in v), 1.0, rel_tol=1e-6)

    hits = dsl.search(
        spark, emb,
        {"query": {"semantic": {"field": "body__embedding",
                                "query": "spark query planning"}},
         "size": 3},
    ).collect()
    ids = [r["doc_id"] for r in hits]
    assert set(ids[:2]) == {1, 2}
    assert ids[2] == 3
    scores = [r["_score"] for r in hits]
    assert scores == sorted(scores, reverse=True)


def test_semantic_query_vector_bypasses_inference(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "doc_id long, v array<float>"
    )
    hits = dsl.search(
        spark, df,
        {"query": {"semantic": {"field": "v", "query_vector": [1.0, 0.0]}}, "size": 2},
    ).collect()
    assert hits[0]["doc_id"] == 1 and hits[0]["_score"] == pytest.approx(1.0)
