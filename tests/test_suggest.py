"""Term/phrase suggesters + _explain breakdown."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators.postings import build_index
from elasticsearch_spark.operators.suggest import explain, phrase_suggest, term_suggest
from elasticsearch_spark.operators.topk import search_topk


@pytest.fixture(scope="module")
def sug_index(spark, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("sug") / "idx")
    rows = [
        ("u1", "spark cluster computing framework", "en"),
        ("u2", "spark spark spark streaming", "en"),
        ("u3", "shark attack at the beach", "en"),
        ("u4", "sparse matrix computing", "en"),
    ]
    df = spark.createDataFrame(rows, "url string, text string, lang string").withColumn(
        "warc_ts", F.lit("2024-01-01").cast("timestamp")
    )
    build_index(spark, df, idx, num_partitions=2)
    return idx


def test_term_suggest_missing_mode(spark, sug_index):
    out = term_suggest(spark, sug_index, "spork computing").collect()
    # "computing" exists → skipped; "spork" → spark (dist 1, df 2) first
    toks = {r["token"] for r in out}
    assert toks == {"spork"}
    assert out[0]["suggestion"] == "spark" and out[0]["distance"] == 1
    # shark/sparse are distance-2 candidates behind spark
    assert [r["suggestion"] for r in out[:3]][0] == "spark"


def test_term_suggest_always_mode(spark, sug_index):
    out = term_suggest(spark, sug_index, "spark", suggest_mode="always").collect()
    sugg = {r["suggestion"] for r in out}
    assert "shark" in sugg or "sparse" in sugg
    assert "spark" not in sugg  # distance 0 excluded


def test_phrase_suggest(spark, sug_index):
    assert phrase_suggest(spark, sug_index, "spork computing") == "spark computing"


def test_explain_sums_to_score(spark, sug_index):
    terms = ["spark", "computing"]
    hits = {
        r["url"]: r["score"]
        for r in search_topk(spark, sug_index, terms, k=10, fetch=True).collect()
    }
    ex = explain(spark, sug_index, terms, "u1").collect()
    assert {r["term"] for r in ex} == {"spark", "computing"}
    assert sum(r["contribution"] for r in ex) == pytest.approx(hits["u1"], rel=1e-9)
