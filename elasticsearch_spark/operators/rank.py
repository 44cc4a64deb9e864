"""Reciprocal rank fusion — hybrid ranking across retrievers.

Re-expresses the reference's RRF ranker (``x-pack/plugin/rank-rrf/src/main/
java/org/elasticsearch/xpack/rank/rrf/RRFRankBuilder.java``; the `rrf`
retriever in the search body): each retriever contributes
``1 / (rank_constant + rank)`` for its top ``rank_window_size`` hits, scores
are summed per document, and the fused list is ordered by
(rrf_score DESC, id ASC).

Plan shape at scale: each input frame is already a top-k retriever result
(coordinator-small by construction — BM25 WAND top-k, knn top-k), so the
per-retriever rank window is a sort over ≤ window rows, and the fusion is a
union + one tiny groupBy. Nothing here touches the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _fuse(
    parts: list[DataFrame],
    id_col: str,
    out_col: str,
    k: int,
) -> DataFrame:
    """Shared fusion tail: union the per-retriever contribution frames
    (id_col, __c), sum per document, and order by (score DESC, id ASC) —
    the single place the tie-break and rounding conventions live."""
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    return (
        allr.groupBy(id_col)
        .agg(
            F.round(F.sum("__c"), 6).alias(out_col),
            F.count("*").cast("int").alias("matched_rankers"),
        )
        .orderBy(F.desc(out_col), F.asc(id_col))
        .limit(k)
    )


def _rank_window(f: DataFrame, id_col: str, score_col: str, window: int) -> DataFrame:
    """Per-retriever top window: scores rounded to 6 dp before ranking so
    float summation noise cannot flip a rank, id ASC tie-break (the
    reference's shard-doc tie-break, ``RRFRankShardContext.java``)."""
    w = Window.orderBy(F.round(F.col(score_col), 6).desc(), F.col(id_col).asc())
    return (
        f.select(id_col, score_col)
        .withColumn("__rank", F.row_number().over(w))
        .where(F.col("__rank") <= window)
    )


def linear_fuse(
    frames: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    weights: list[float] | None = None,
    normalizer: str = "minmax",
    rank_window_size: int = 100,
    k: int = 10,
) -> DataFrame:
    """Linear retriever (x-pack ``LinearRetrieverBuilder.java``): fused
    score = Σ weight_i · normalize_i(score_i) over each retriever's top
    window. Normalizers: "minmax" ((s−min)/(max−min) over the window),
    "l2_norm" (s/‖s‖₂), "none". Same coordinator-small shape as rrf_fuse."""
    weights = weights or [1.0] * len(frames)
    parts = []
    for f, w in zip(frames, weights):
        top = _rank_window(f, id_col, score_col, rank_window_size)
        wf = Window.partitionBy()
        s = F.col(score_col)
        if normalizer == "minmax":
            mn, mx = F.min(s).over(wf), F.max(s).over(wf)
            norm = F.when(mx > mn, (s - mn) / (mx - mn)).otherwise(F.lit(1.0))
        elif normalizer == "l2_norm":
            norm = s / F.sqrt(F.sum(s * s).over(wf))
        else:
            norm = s
        parts.append(top.select(id_col, (F.lit(float(w)) * norm).alias("__c")))
    return _fuse(parts, id_col, "linear_score", k)


def rrf_fuse(
    frames: list[DataFrame],
    id_col: str = "doc_id",
    score_col: str = "score",
    rank_constant: int = 60,
    rank_window_size: int = 100,
    k: int = 10,
) -> DataFrame:
    """Fuse ranked retriever results by reciprocal rank: each retriever
    contributes 1/(rank_constant + rank) for its top window."""
    parts = [
        _rank_window(f, id_col, score_col, rank_window_size).select(
            id_col, (1.0 / (F.lit(rank_constant) + F.col("__rank"))).alias("__c")
        )
        for f in frames
    ]
    return _fuse(parts, id_col, "rrf_score", k)


def rank_eval(
    results: DataFrame,
    ratings: DataFrame,
    k: int = 10,
    relevant_min: int = 1,
    max_rating: int = 3,
    qid: str = "query_id",
    doc: str = "doc_id",
) -> DataFrame:
    """``_rank_eval`` — per-query IR quality metrics over rated search
    results (``modules/rank-eval``: ``PrecisionAtK.java``,
    ``RecallAtK.java``, ``MeanReciprocalRank.java``,
    ``DiscountedCumulativeGain.java``, ``ExpectedReciprocalRank.java``).

    ``results``: (qid, doc, rank) — rank 1-based, the engine's ranking.
    ``ratings``: (qid, doc, rating) — graded judgments; docs absent from
    ``ratings`` are unlabeled and count as irrelevant (the reference's
    ``ignore_unlabeled: false`` default).

    Returns one row per query: p_at_k, recall_at_k, mrr, dcg, ndcg, err.
    ERR uses the exp/Σln prefix-product formulation (R < 1 always since
    R = (2^g − 1)/2^max_rating), so every metric is window/groupBy math —
    per-query work is O(k), the only shuffles key on the query id, and
    the input frames are coordinator-small top-k results by construction.
    """
    r = results.where(F.col("rank") <= k).alias("r")
    g = ratings.alias("g")
    j = r.join(
        g, (F.col(f"r.{qid}") == F.col(f"g.{qid}")) & (F.col(f"r.{doc}") == F.col(f"g.{doc}")), "left"
    ).select(
        F.col(f"r.{qid}").alias(qid),
        F.col("r.rank").alias("rank"),
        F.coalesce(F.col("g.rating"), F.lit(0)).alias("rating"),
    )
    rel = (F.col("rating") >= relevant_min).cast("double")
    gain = F.pow(F.lit(2.0), F.col("rating")) - 1.0
    rr = F.pow(F.lit(2.0), F.col("rating")) - 1.0
    R = rr / float(1 << max_rating)
    w_prev = (
        Window.partitionBy(qid)
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.exp(F.coalesce(F.sum(F.log(1.0 - R)).over(w_prev), F.lit(0.0)))
    per_hit = j.select(
        qid,
        "rank",
        rel.alias("rel"),
        (gain / F.log2(F.col("rank") + 1.0)).alias("dg"),
        (R / F.col("rank") * prefix).alias("err_term"),
    )
    base = per_hit.groupBy(qid).agg(
        (F.sum("rel") / F.count("*")).alias("p_at_k"),
        F.sum("rel").alias("__rel_ret"),
        F.min(F.when(F.col("rel") > 0, F.col("rank"))).alias("__first_rel"),
        F.sum("dg").alias("dcg"),
        F.sum("err_term").alias("err"),
    )
    mrr = F.when(
        F.col("__first_rel").isNotNull(), 1.0 / F.col("__first_rel")
    ).otherwise(F.lit(0.0))
    # ideal DCG from ALL judgments (top-k by rating desc; equal gains
    # commute across tied positions, so any tie order gives the same sum)
    w_ideal = Window.partitionBy(qid).orderBy(F.desc("rating"), F.asc(doc))
    ideal = (
        ratings.withColumn("__ir", F.row_number().over(w_ideal))
        .where((F.col("__ir") <= k) & (F.col("rating") > 0))
        .groupBy(qid)
        .agg(
            F.sum(
                (F.pow(F.lit(2.0), F.col("rating")) - 1.0)
                / F.log2(F.col("__ir") + 1.0)
            ).alias("idcg")
        )
    )
    totals = ratings.groupBy(qid).agg(
        F.sum((F.col("rating") >= relevant_min).cast("long")).alias("__n_rel")
    )
    return (
        base.join(ideal, qid, "left")
        .join(totals, qid, "left")
        .select(
            qid,
            "p_at_k",
            F.when(
                F.coalesce(F.col("__n_rel"), F.lit(0)) > 0,
                F.col("__rel_ret") / F.col("__n_rel"),
            ).otherwise(F.lit(0.0)).alias("recall_at_k"),
            mrr.alias("mrr"),
            "dcg",
            F.when(
                F.coalesce("idcg", F.lit(0.0)) > 0, F.col("dcg") / F.col("idcg")
            ).otherwise(F.lit(0.0)).alias("ndcg"),
            "err",
        )
    )
