"""BM25 scoring math (LegacyBM25Similarity semantics).

Formula pinned by the reference defaults
(``server/.../index/similarity/SimilarityProviders.java:254-262``:
k1=1.2, b=0.75, discount_overlaps=true) and the (k1+1) numerator ES keeps
for backwards compatibility
(``server/.../lucene/similarity/LegacyBM25Similarity.java:27-45``):

    idf(term)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score(t,d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))

with dl = SmallFloat-quantized doc length (see smallfloat.py) and
avgdl = sumTotalTermFreq / docCount computed GLOBALLY (the dfs-phase
broadcast, ``server/.../search/dfs/DfsPhase.java:31-81``) so scores are
deterministic across partitions/shuffles.

All functions are numpy-vectorized; intermediates in float64, with an
optional float32 cast matching Lucene's final float score.
"""

from __future__ import annotations

import numpy as np

K1 = 1.2
B = 0.75


def idf(df: np.ndarray | float, doc_count: float) -> np.ndarray:
    df = np.asarray(df, dtype=np.float64)
    return np.log(1.0 + (doc_count - df + 0.5) / (df + 0.5))


def tf_norm(tf: np.ndarray, dl: np.ndarray, avgdl: float, k1: float = K1, b: float = B) -> np.ndarray:
    tf = np.asarray(tf, dtype=np.float64)
    dl = np.asarray(dl, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def score(
    tf: np.ndarray,
    df: np.ndarray,
    dl: np.ndarray,
    doc_count: float,
    avgdl: float,
    k1: float = K1,
    b: float = B,
    boost: float = 1.0,
    float32: bool = False,
) -> np.ndarray:
    """Per-(term, doc) BM25 contribution."""
    s = boost * idf(df, doc_count) * (k1 + 1.0) * tf_norm(tf, dl, avgdl, k1, b)
    return s.astype(np.float32) if float32 else s


def sql_score_expr(
    tf_col: str,
    df_col: str,
    dl_col: str,
    doc_count_col: str,
    avgdl_col: str,
    k1: float = K1,
    b: float = B,
) -> str:
    """The same formula as a Spark-SQL (and ANSI/DuckDB) expression string,
    so engine plans and the DuckDB oracle share one definition."""
    return (
        f"ln(1.0 + ({doc_count_col} - {df_col} + 0.5) / ({df_col} + 0.5))"
        f" * ({tf_col} * ({k1} + 1.0))"
        f" / ({tf_col} + {k1} * (1.0 - {b} + {b} * {dl_col} / {avgdl_col}))"
    )


def sql_quantized_dl_expr(dl_col: str) -> str:
    """SmallFloat decode(encode(dl)) as a portable SQL expression: keep the
    top 4 significant bits of dl (exact below 8)."""
    shift = f"(cast(floor(log2({dl_col})) as int) - 3)"
    return (
        f"case when {dl_col} < 8 then {dl_col} "
        f"else ({dl_col} >> {shift}) << {shift} end"
    )
