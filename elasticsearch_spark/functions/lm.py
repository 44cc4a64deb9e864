"""Statistical language-model quality filtering (the CCNet recipe:
score every document by the perplexity of a corpus-level n-gram LM;
outliers — gibberish, boilerplate, wrong-language — land in the tails).

Spark-first shape: the LM *is* a pair of count tables (unigram, bigram)
built by one explode + two aggregations over the corpus; scoring joins each
document's bigrams back to those tables. No model artifact, no UDF, no
broadcast requirement — at 10^12 docs the count tables shuffle on their
natural keys and the scoring join is a plain shuffled hash join Catalyst
can also choose to broadcast when the vocabulary is small.

Math (add-k smoothed bigram LM, the textbook formulation):
    logp(doc) = mean over bigrams (w1,w2) of
                ln( (c(w1,w2) + k) / (c(w1) + k·V) )
    perplexity(doc) = exp(-logp(doc))
where V = unigram vocabulary size. Documents with fewer than 2 tokens have
no bigrams and score NULL (filtered upstream by length rules anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _doc_bigrams(df: DataFrame, key: str, text_col: str) -> DataFrame:
    """(key, w1, w2) — one row per bigram occurrence, order preserved."""
    toks = F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)")
    pairs = F.expr(
        # get() (not bracket indexing) -> NULL past the end, filtered out
        "filter(transform(toks, (t, i) -> struct(t AS w1, get(toks, i + 1) AS w2)),"
        " p -> p.w2 IS NOT NULL)"
    )
    return (
        df.select(F.col(key).alias("__key"), toks.alias("toks"))
        .select("__key", F.explode(pairs).alias("bg"))
        .select("__key", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )


def bigram_lm_score(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Per-document (key, logp, perplexity) under the corpus's own bigram
    LM — self-scoring, the CCNet setup where the LM trains on the corpus
    being filtered (or, in production, on a trusted reference corpus: pass
    that corpus's count frames via ``score_against`` instead)."""
    bigrams = _doc_bigrams(df, key, text_col)
    bg_counts = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    uni = bigrams.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = uni.count()  # V: one scalar aggregate
    scored = (
        bigrams.join(bg_counts, ["w1", "w2"])
        .join(uni, "w1")
        .withColumn(
            "lp",
            F.log((F.col("c12") + F.lit(k)) / (F.col("c1") + F.lit(k * vocab))),
        )
        .groupBy("__key")
        .agg(F.avg("lp").alias("logp"))
        .withColumn("perplexity", F.exp(-F.col("logp")))
    )
    return scored.withColumnRenamed("__key", key)


def perplexity_filter(
    df: DataFrame,
    max_perplexity: float,
    key: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Keep documents under the perplexity ceiling (CCNet keeps the
    low-perplexity head/middle buckets). Documents with no bigrams are
    dropped — unscorable is not the same as good."""
    scores = bigram_lm_score(df, key=key, text_col=text_col, k=k)
    keep = scores.where(F.col("perplexity") <= max_perplexity).select(key)
    return df.join(keep, key, "left_semi")


def bigram_lm_score_kn(
    df: DataFrame,
    key: str = "doc_id",
    text_col: str = "text",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document perplexity under an interpolated Kneser-Ney bigram LM
    — the smoothing KenLM/CCNet actually use (Kneser & Ney 1995; Chen &
    Goodman 1998 interpolated form, fixed discount D):

        P(w2|w1) = max(c(w1,w2) − D, 0) / c(w1)
                 + (D · N1+(w1·) / c(w1)) · N1+(·w2) / T

    with N1+(w1·) = distinct continuations of w1, N1+(·w2) = distinct
    left-contexts of w2, T = total distinct bigram types. Still nothing
    but count tables and joins — the KN "novel-continuation" counts are
    two extra groupBys over the SAME bigram-type frame, so the plan grows
    by zero scans. Unseen w1 backs off to the continuation probability
    alone; the self-scoring setup (LM trained on the corpus it scores)
    never hits that branch.
    """
    bigrams = _doc_bigrams(df, key, text_col)
    bg = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    left = bg.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("nfwd")
    )
    right = bg.groupBy("w2").agg(F.count("*").alias("nbwd"))
    types = bg.count()  # T: one scalar aggregate
    d = float(discount)
    # OOV floors (only reachable when scoring against a FOREIGN corpus LM):
    # unseen pair -> c12=0 (pure continuation mass); unseen w2 -> half-count
    # continuation floor; unseen w1 -> back off to P_cont(w2) alone.
    pcont = F.coalesce(F.col("nbwd"), F.lit(0.5)) / F.lit(float(types))
    p = F.when(
        F.col("c1").isNotNull(),
        F.greatest(F.coalesce(F.col("c12"), F.lit(0)) - F.lit(d), F.lit(0.0))
        / F.col("c1")
        + F.lit(d) * F.col("nfwd") / F.col("c1") * pcont,
    ).otherwise(pcont)
    scored = (
        bigrams.join(bg, ["w1", "w2"], "left")
        .join(left, "w1", "left")
        .join(right, "w2", "left")
        .withColumn("lp", F.log(p))
        .groupBy("__key")
        .agg(F.avg("lp").alias("logp"))
        .withColumn("perplexity", F.exp(-F.col("logp")))
    )
    return scored.withColumnRenamed("__key", key)
