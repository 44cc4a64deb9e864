"""Bigram-LM perplexity filtering (functions/lm.py, CCNet recipe):
count-table LM, add-k smoothing, self-scoring, ceiling filter."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.functions.lm import bigram_lm_score, perplexity_filter


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "the dog sat on the mat"),
        (4, "zx qv pj wk bn zz"),  # gibberish: every bigram is unique
        (5, "one"),  # single token: no bigrams
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gibberish_scores_higher_perplexity(corpus):
    scores = {r["doc_id"]: r["perplexity"] for r in bigram_lm_score(corpus).collect()}
    assert 5 not in scores  # no bigrams -> unscorable
    assert scores[4] > scores[1]
    assert scores[4] > scores[2]
    assert scores[4] > scores[3]


def test_exact_math_tiny_case(spark):
    # corpus "a b", "a b", "a c": V = 2 (w1 vocab {a, b}? -> w1 only 'a'...)
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a c")], "doc_id long, text string"
    )
    # bigrams: doc1 = (a,b),(b,a),(a,b); doc2 = (a,c)
    # c(a,b)=2 c(b,a)=1 c(a,c)=1; c1(a)=3 c1(b)=1; V=2
    v = 2.0
    lp_ab = math.log((2 + 1) / (3 + v))
    lp_ba = math.log((1 + 1) / (1 + v))
    lp_ac = math.log((1 + 1) / (3 + v))
    want1 = math.exp(-(lp_ab + lp_ba + lp_ab) / 3)
    want2 = math.exp(-lp_ac)
    got = {r["doc_id"]: r["perplexity"] for r in bigram_lm_score(df).collect()}
    assert got[1] == pytest.approx(want1, rel=1e-9)
    assert got[2] == pytest.approx(want2, rel=1e-9)


def test_perplexity_filter_keeps_head(corpus):
    scores = {r["doc_id"]: r["perplexity"] for r in bigram_lm_score(corpus).collect()}
    ceiling = (scores[3] + scores[4]) / 2  # between normal docs and gibberish
    kept = {r["doc_id"] for r in perplexity_filter(corpus, ceiling).collect()}
    assert kept == {1, 2, 3}  # gibberish and unscorable both dropped


def test_kn_bigram_exact_math(spark):
    """Hand-computed interpolated KN on a 2-doc corpus."""
    import math

    from elasticsearch_spark.functions.lm import bigram_lm_score_kn

    # corpus bigrams: d1: (a b) (b a) (a b); d2: (a b) (b c)
    rows = [(1, "a b a b"), (2, "a b c")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["logp"] for r in
           bigram_lm_score_kn(df, discount=0.75).collect()}
    # counts: c(ab)=3, c(ba)=1, c(bc)=1; c1(a)=3, c1(b)=2
    # nfwd(a)=1, nfwd(b)=2; nbwd(b)=1, nbwd(a)=1, nbwd(c)=1; T=3
    D = 0.75
    T = 3.0
    p_ab = (3 - D) / 3 + D * 1 / 3 * (1 / T)
    p_ba = (1 - D) / 2 + D * 2 / 2 * (1 / T)
    p_bc = (1 - D) / 2 + D * 2 / 2 * (1 / T)
    exp1 = (math.log(p_ab) + math.log(p_ba) + math.log(p_ab)) / 3
    exp2 = (math.log(p_ab) + math.log(p_bc)) / 2
    assert abs(out[1] - exp1) < 1e-12
    assert abs(out[2] - exp2) < 1e-12
    # KN probabilities over each context sum to <= 1 (mass reserved = D*nfwd/c1*(uncovered pcont))
    assert 0 < p_ab < 1 and 0 < p_ba < 1
