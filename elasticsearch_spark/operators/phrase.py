"""Phrase search over the index + highlighting (fetch sub-phases).

match_phrase against the inverted index (MatchPhraseQueryBuilder.java
semantics, v1): the candidate set is the CONJUNCTION of the phrase's terms
(resolved via the postings index — block-max WAND-capable), then the fetch
phase verifies positional adjacency on the candidates' analyzed token
streams. Since candidates ≪ corpus (every phrase term must co-occur), the
verify step touches only the top conjunctive matches — the same
narrow-then-verify shape the reference uses (positions live in the
postings there; here they are re-derived at fetch, trading index size for
a cheap verify join).

Slop support (`slop=n`): tokens may be up to n positions apart out of
order budget, matching Lucene's sloppy phrase semantics approximately
(min-window containment), exact for slop=0.

Highlighting = the `highlight` fetch sub-phase
(``server/.../search/fetch/subphase/highlight/``): regexp-tagged fragments
around the first match, `<em>`-wrapped, as native Column expressions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..functions import analysis
from ..sources import index_store as store
from .topk import search_topk


def _phrase_verify_udf(terms: list[str], analyzer: str, slop: int):
    config = analysis.ANALYZER_CONFIGS.get(analyzer)

    @F.pandas_udf(BooleanType())
    def verify(texts: pd.Series) -> pd.Series:
        if analyzer not in analysis.ANALYZERS and config is not None:
            analysis.register_analyzer(analyzer, config[0], config[1])
        fn = analysis.ANALYZERS[analyzer]

        def check(text: str) -> bool:
            toks = fn(text) if text else []
            if slop == 0:
                n = len(terms)
                return any(toks[i : i + n] == terms for i in range(len(toks) - n + 1))
            # sloppy: a window of width len(terms)+slop containing all terms
            # in order with gaps ≤ slop total
            positions = {t: [i for i, x in enumerate(toks) if x == t] for t in terms}
            if any(not v for v in positions.values()):
                return False
            import itertools

            for combo in itertools.product(*[positions[t] for t in terms]):
                if all(combo[j + 1] > combo[j] for j in range(len(combo) - 1)) and (
                    combo[-1] - combo[0] - (len(terms) - 1) <= slop
                ):
                    return True
            return False

        return texts.map(check)

    return verify


def search_phrase(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    slop: int = 0,
    candidate_factor: int = 20,
) -> DataFrame:
    """match_phrase over the index: conjunctive candidates → positional
    verify on fetched text → top-k by BM25 (score DESC, doc_id ASC)."""
    meta = store.IndexMeta.load(index_dir)
    terms = analysis.analyze(phrase, meta.analyzer)
    if not terms:
        return spark.createDataFrame([], "doc_id long, url string, score double")
    cands = search_topk(
        spark, index_dir, terms, k=k * candidate_factor, operator="and", fetch=False
    )
    docs = spark.read.parquet(store.docs_glob(index_dir)).select("doc_id", "url", "text")
    verified = (
        docs.join(F.broadcast(cands), "doc_id")
        .where(_phrase_verify_udf(terms, meta.analyzer, slop)(F.col("text")))
    )
    return (
        verified.select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def highlight(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    fragment_size: int = 100,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
) -> DataFrame:
    """Add a `highlight` column: a fragment of ±fragment_size/2 chars
    around the first matching term, matches wrapped in tags. Pure Column
    expressions (unified-highlighter-lite)."""
    pat = "|".join(sorted((t for t in terms), key=len, reverse=True))
    first_pos = F.expr(
        f"locate(regexp_extract(lower({text_col}), '(?i)({pat})', 1), lower({text_col}))"
    )
    half = fragment_size // 2
    frag_start = F.greatest(first_pos - half, F.lit(1))
    fragment = F.when(
        first_pos > 0,
        F.col(text_col).substr(frag_start, F.lit(fragment_size)),
    ).otherwise(F.col(text_col).substr(F.lit(1), F.lit(fragment_size)))
    tagged = F.regexp_replace(fragment, f"(?i)({pat})", f"{pre_tag}$1{post_tag}")
    return df.withColumn("highlight", tagged)
