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


def _index_positions(index_dir: str, terms: list[str], cand_ids: set[int]) -> dict[str, dict[int, "np.ndarray"]]:
    """Per term: {doc_id: ascending positions} for candidate docs, decoded
    straight from the postings blocks (DOCS_AND_FREQS_AND_POSITIONS)."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    from .codec import vbyte_decode
    from .postings import decode_positions

    out: dict[str, dict[int, np.ndarray]] = {t: {} for t in terms}
    lo, hi = min(cand_ids), max(cand_ids)
    for seg in store.list_segs(index_dir):
        p = os.path.join(store.seg_dir(index_dir, seg), "postings.parquet")
        tbl = pq.read_table(
            p,
            columns=["term", "first_doc_id", "last_doc_id", "ids_bytes", "tf_bytes", "pos_bytes"],
            filters=[("term", "in", list(set(terms))), ("last_doc_id", ">=", lo), ("first_doc_id", "<=", hi)],
        )
        for i in range(tbl.num_rows):
            ids = np.cumsum(vbyte_decode(tbl["ids_bytes"][i].as_py()).astype(np.int64)) + int(
                tbl["first_doc_id"][i].as_py()
            )
            tfs = vbyte_decode(tbl["tf_bytes"][i].as_py()).astype(np.int64)
            pb = tbl["pos_bytes"][i].as_py()
            if not pb:
                raise LookupError("index has no positions")
            flat, occ_off = decode_positions(pb, tfs)
            term = tbl["term"][i].as_py()
            for j, d in enumerate(ids):
                if int(d) in cand_ids:
                    out[term][int(d)] = flat[occ_off[j] : occ_off[j + 1]]
    return out


def _verify_by_positions(tpos: list, slop: int) -> bool:
    """Ordered phrase check over per-term position arrays."""
    import numpy as np

    if any(p is None or len(p) == 0 for p in tpos):
        return False
    if slop == 0:
        starts = np.asarray(tpos[0])
        for i, arr in enumerate(tpos[1:], start=1):
            starts = starts[np.isin(starts + i, arr)]
            if len(starts) == 0:
                return False
        return True
    import itertools

    for combo in itertools.product(*[list(p) for p in tpos]):
        if all(combo[j + 1] > combo[j] for j in range(len(combo) - 1)) and (
            combo[-1] - combo[0] - (len(tpos) - 1) <= slop
        ):
            return True
    return False


def search_phrase(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    slop: int = 0,
    candidate_factor: int = 20,
) -> DataFrame:
    """match_phrase over the index: conjunctive candidates → positional
    verify → top-k by BM25 (score DESC, doc_id ASC). The verify reads the
    postings' POSITIONS when the index carries them (the text-field
    default layout); legacy position-less indexes fall back to re-analyzing
    the stored text of the candidates."""
    meta = store.IndexMeta.load(index_dir)
    terms = analysis.analyze(phrase, meta.analyzer)
    if not terms:
        return spark.createDataFrame([], "doc_id long, url string, score double")
    cands = search_topk(
        spark, index_dir, terms, k=k * candidate_factor, operator="and", fetch=False
    )
    cand_rows = cands.collect()
    if not cand_rows:
        return spark.createDataFrame([], "doc_id long, url string, score double")
    cand_ids = {int(r["doc_id"]) for r in cand_rows}

    try:
        pos_map = _index_positions(index_dir, terms, cand_ids)
        ok_ids = [
            d for d in cand_ids
            if _verify_by_positions([pos_map[t].get(d) for t in terms], slop)
        ]
        score_of = {int(r["doc_id"]): r["score"] for r in cand_rows}
        top = sorted(ok_ids, key=lambda d: (-score_of[d], d))[:k]
        docs = spark.read.parquet(store.docs_glob(index_dir)).select("doc_id", "url")
        hit_df = spark.createDataFrame(
            [(d, float(score_of[d])) for d in top], "doc_id long, score double"
        )
        return (
            docs.join(F.broadcast(hit_df), "doc_id")
            .select("doc_id", "url", "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
        )
    except LookupError:
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


def _verify_intervals(tpos: list, ordered: bool, max_gaps: int) -> bool:
    """intervals query semantics (IntervalQueryBuilder.java match source):
    an interval containing all terms, in order when `ordered`, with total
    internal gap ≤ max_gaps (-1 = unbounded)."""
    import itertools

    if any(p is None or len(p) == 0 for p in tpos):
        return False
    n = len(tpos)
    for combo in itertools.product(*[list(p) for p in tpos]):
        if len(set(combo)) < n:
            continue
        if ordered and not all(combo[j + 1] > combo[j] for j in range(n - 1)):
            continue
        width = max(combo) - min(combo)
        if max_gaps < 0 or width - (n - 1) <= max_gaps:
            return True
    return False


def search_intervals(
    spark: SparkSession,
    index_dir: str,
    text: str,
    ordered: bool = True,
    max_gaps: int = -1,
    k: int = 10,
    candidate_factor: int = 20,
) -> DataFrame:
    """intervals query (ordered/unordered proximity algebra) over the
    positional index: conjunctive candidates → interval verify → top-k."""
    meta = store.IndexMeta.load(index_dir)
    terms = analysis.analyze(text, meta.analyzer)
    if not terms:
        return spark.createDataFrame([], "doc_id long, url string, score double")
    cands = search_topk(
        spark, index_dir, terms, k=k * candidate_factor, operator="and", fetch=False
    ).collect()
    if not cands:
        return spark.createDataFrame([], "doc_id long, url string, score double")
    cand_ids = {int(r["doc_id"]) for r in cands}
    pos_map = _index_positions(index_dir, terms, cand_ids)
    score_of = {int(r["doc_id"]): r["score"] for r in cands}
    ok = [
        d for d in cand_ids
        if _verify_intervals([pos_map[t].get(d) for t in terms], ordered, max_gaps)
    ]
    top = sorted(ok, key=lambda d: (-score_of[d], d))[:k]
    docs = spark.read.parquet(store.docs_glob(index_dir)).select("doc_id", "url")
    hit_df = spark.createDataFrame(
        [(d, float(score_of[d])) for d in top], "doc_id long, score double"
    )
    return (
        docs.join(F.broadcast(hit_df), "doc_id")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
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
