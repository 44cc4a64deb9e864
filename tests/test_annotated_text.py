"""annotated_text mapper (plugins/mapper-annotated-text): parse, injected
positions, annotated term + mixed word/annotation phrase queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.functions.annotated_text import (
    annotated_phrase,
    annotated_term,
    parse_annotated,
    parse_annotated_udf,
)

ROWS = [
    (1, "[Alice](Person&ref:a1) visited [New York City](City) last spring"),
    (2, "nobody visited anything"),
    (3, "the city of [Paris](City) is in [France](Country)"),
    (4, "[Alice](Person) met [Bob](Person) in [Paris](City)"),
]


def test_parse_plain_and_positions():
    text, ann = parse_annotated(ROWS[0][1])
    assert text == "Alice visited New York City last spring"
    # Alice at token 0; multi-token span City at its FIRST token (pos 2)
    assert ("Person", 0) in ann and ("ref:a1", 0) in ann
    assert ("City", 2) in ann


def test_parse_url_decoding_and_empty():
    # the wrapped text is literal; only annotation VALUES are URL-decoded
    text, ann = parse_annotated("[café](Caf%C3%A9%20Entity) time")
    assert text == "café time"
    assert ann == [("Café Entity", 0)]
    assert parse_annotated("no annotations here") == ("no annotations here", [])


@pytest.fixture(scope="module")
def adf(spark):
    from elasticsearch_spark.functions.analysis import tokens_udf

    df = spark.createDataFrame(ROWS, "id long, raw string")
    parsed = df.select("id", parse_annotated_udf("standard")("raw").alias("p"))
    return parsed.select(
        "id",
        F.col("p.text").alias("text"),
        F.col("p.ann").alias("ann"),
        tokens_udf("standard")(F.col("p.text")).alias("tokens"),
    ).cache()


def test_annotated_term_query(adf):
    got = sorted(r.id for r in adf.where(annotated_term(F.col("ann"), "City")).collect())
    assert got == [1, 3, 4]
    got = sorted(r.id for r in adf.where(annotated_term(F.col("ann"), "Country")).collect())
    assert got == [3]
    assert adf.where(annotated_term(F.col("ann"), "Nope")).count() == 0


def test_phrase_word_then_annotation(adf):
    # "visited <City>" — id 1 only (annotation sits at the span's first token)
    pred = annotated_phrase(
        F.col("tokens"), F.col("ann"), [{"term": "visited"}, {"annotation": "City"}]
    )
    assert sorted(r.id for r in adf.where(pred).collect()) == [1]


def test_phrase_annotation_then_word(adf):
    # "<Person> met" — id 4
    pred = annotated_phrase(
        F.col("tokens"), F.col("ann"), [{"annotation": "Person"}, {"term": "met"}]
    )
    assert sorted(r.id for r in adf.where(pred).collect()) == [4]


def test_phrase_two_annotations_not_adjacent(adf):
    # "<Person> <City>" adjacent: id 4 has "Bob in Paris" (not adjacent);
    # id 1 "Alice visited New..." (not adjacent) -> no hits
    pred = annotated_phrase(
        F.col("tokens"), F.col("ann"), [{"annotation": "Person"}, {"annotation": "City"}]
    )
    assert adf.where(pred).count() == 0


def test_plain_words_still_searchable(adf):
    pred = annotated_phrase(F.col("tokens"), F.col("ann"), [{"term": "york"}, {"term": "city"}])
    assert sorted(r.id for r in adf.where(pred).collect()) == [1]
