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
