"""Bag-of-words quality classifier — the "fastText-style quality filter"
slot of an LLM data pipeline (GPT-3's reference-vs-crawl classifier, the
CCNet/RedPajama recipe: a linear model over token features scoring how
reference-like a document is).

Multinomial Naive Bayes is the closed-form member of that family and the
one that trains scale-free inside Spark: training is ONE groupBy over
(token, label) occurrence counts — exactly mergeable across partitions,
no gradient loop, no model artifact beyond a (token, weight) table — and
scoring is ONE explode + join + per-doc sum. Deterministic end to end. A
logistic-regression weight table trained offline drops into the same
``score_tokens`` join unchanged (NB and LR differ only in how the weight
table is produced; both score as prior + Σ w[token]).

Scale notes (10^12 docs): the training shuffle keys on the token (uniform
after lowercasing; hot stopwords are just large partial counts — partial
map-side aggregation absorbs them), the scoring shuffle keys on the doc
key. The three scalar totals (per-class token mass, vocab size, doc-class
counts) are one tiny aggregate collected to the driver — constants of the
model, not per-row state.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_nb(
    df: DataFrame, toks_col: str, label_col: str, add_k: float = 0.5
) -> tuple[DataFrame, float, float]:
    """Train multinomial NB with add-k smoothing on a boolean/int label.

    Returns (weights, prior, oov_w): ``weights`` is a (token, w) frame
    with w = log P(token|pos) − log P(token|neg); ``prior`` is the class
    log-odds; ``oov_w`` is the weight of an unseen token (both classes at
    the smoothing floor — a constant, applied via coalesce at score time).
    """
    ex = df.select(
        F.col(label_col).cast("int").alias("__y"),
        F.explode(F.col(toks_col)).alias("token"),
    )
    tot = ex.agg(
        F.sum("__y").alias("tp"),
        F.count("*").alias("tt"),
        F.countDistinct("token").alias("v"),
    ).first()
    tp, tn = float(tot["tp"]), float(tot["tt"] - tot["tp"])
    kv = add_k * float(tot["v"])
    dc = (
        df.agg(
            F.sum(F.col(label_col).cast("int")).alias("np"),
            F.count("*").alias("nt"),
        ).first()
    )
    n_pos, n_neg = float(dc["np"]), float(dc["nt"] - dc["np"])
    if n_pos == 0 or n_neg == 0:
        raise ValueError("train_nb needs both classes present")
    prior = math.log(n_pos / n_neg)
    oov_w = math.log(add_k / (tp + kv)) - math.log(add_k / (tn + kv))
    weights = (
        ex.groupBy("token")
        .agg(F.sum("__y").alias("cp"), F.count("*").alias("ct"))
        .select(
            "token",
            (
                F.log((F.col("cp") + add_k) / F.lit(tp + kv))
                - F.log((F.col("ct") - F.col("cp") + add_k) / F.lit(tn + kv))
            ).alias("w"),
        )
    )
    return weights, prior, oov_w


def score_tokens(
    df: DataFrame,
    key: str,
    toks_col: str,
    weights: DataFrame,
    prior: float,
    oov_w: float,
) -> DataFrame:
    """Score docs with a (token, w) weight table: score = prior + Σ w over
    token OCCURRENCES (multinomial — repeats count), unseen tokens get
    ``oov_w``. Returns (key, score); token-less docs score the bare prior.
    One explode, one join keyed on token, one groupBy on the doc key."""
    ex = df.select(F.col(key).alias(key), F.explode(F.col(toks_col)).alias("token"))
    sums = (
        ex.join(weights, "token", "left")
        .withColumn("w", F.coalesce("w", F.lit(oov_w)))
        .groupBy(key)
        .agg(F.sum("w").alias("__sw"))
    )
    return (
        df.select(key)
        .join(sums, key, "left")
        .select(
            key,
            (F.lit(prior) + F.coalesce("__sw", F.lit(0.0))).alias("score"),
        )
    )
