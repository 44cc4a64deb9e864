"""Positional queries over the index (phrase / phrase_prefix / intervals)
+ highlighting (fetch sub-phase).

match_phrase (``server/.../index/query/MatchPhraseQueryBuilder.java``),
match_phrase_prefix (``MatchPhrasePrefixQueryBuilder.java``) and intervals
(``IntervalQueryBuilder.java``) against the DOCS_AND_FREQS_AND_POSITIONS
postings. Execution is FULLY DISTRIBUTED: doc ids are segment-local
(``doc_id = pid << 40 | row``), so every occurrence of a document lives in
exactly one segment — the positional verify runs inside the per-segment
scorer task (``mapInPandas`` over a seg-id frame, zero shuffle, no driver
filesystem access), and the coordinator merge is the same ≤k-rows-per-task
``orderBy(score, doc_id).limit(k)`` as the WAND query phase.

The ordered verify is a VECTORIZED GREEDY CHAIN over sorted position
lists (the standard two-pointer sweep, O(total occurrences · n_terms)):
occurrences are keyed ``dense_doc << 32 | position``; for each occurrence
of the first term, each later term advances to its smallest key strictly
greater than the current chain key within the same doc (`searchsorted`).
The greedy chain yields the minimal window end for every start, so
``width - (n-1) <= slop`` is exact — no ``itertools.product`` blow-up on
docs that repeat phrase terms many times.

Scoring: verified docs are ranked by the BM25 sum of the query terms
(global df via the build-time stats table — DfsPhase determinism), ties
broken by doc_id ASC, matching ``SearchPhaseController.java:202-205``.

Slop semantics: ordered, total internal gap ≤ slop (exact for slop=0;
Lucene's transposition-cost sloppy matching is intentionally not
reproduced — ordered-sloppy is the documented subset).

Highlighting = the ``highlight`` fetch sub-phase
(``server/.../search/fetch/subphase/highlight/``): regexp-tagged fragments
around the first match, ``<em>``-wrapped, as native Column expressions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from ..functions import analysis
from ..functions import bm25
from ..sources import index_store as store
from .topk import CAND_SCHEMA, _term_weights

_POS_BITS = 32
_POS_MASK = (1 << _POS_BITS) - 1

# footer probe results; segments are immutable so a path's answer never changes
_POS_PROBE_CACHE: dict[str, bool | None] = {}


def _segment_has_positions(path: str) -> bool | None:
    """Footer-only probe: does this segment's postings file carry position
    data? Decided from the parquet column statistics (an all-empty
    ``pos_bytes`` chunk has ``max == b""``); None when statistics are
    absent (unknown). No data pages are read."""
    if path in _POS_PROBE_CACHE:
        return _POS_PROBE_CACHE[path]
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = [md.schema.column(i).name for i in range(md.num_columns)]
    out: bool | None
    if "pos_bytes" not in names:
        out = False
    else:
        i = names.index("pos_bytes")
        out = None
        saw = False
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(i).statistics
            if st is None or not st.has_min_max:
                continue
            saw = True
            if st.max not in (b"", None):
                out = True
                break
        if out is None and saw:
            out = False
    _POS_PROBE_CACHE[path] = out
    return out


def index_has_positions(index_dir: str) -> bool:
    """False when some current segment provably lacks positions. Unknown
    (statistics absent) counts as positional — normal builds always store
    positions and must not silently take the slow text-rescan path."""
    return not any(
        _segment_has_positions(
            os.path.join(store.seg_dir(index_dir, s), "postings.parquet")
        ) is False
        for s in store.list_segs(index_dir)
    )


# --------------------------------------------------------------------------
# in-task decode helpers (run inside the per-segment scorer)
# --------------------------------------------------------------------------

def _decode_term(post: pd.DataFrame) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All blocks of ONE term in one segment → (doc_ids, tfs, flat_pos,
    occ_off). Blocks concatenate cleanly: the VByte positions stream stores
    each posting's first occurrence absolute, so per-posting offsets are
    all that's needed to slice it."""
    from .codec import decode_block
    from .postings import decode_positions

    ids_l, tfs_l = [], []
    for fd, ib, tb in zip(post["first_doc_id"], post["ids_bytes"], post["tf_bytes"]):
        ids, tfs = decode_block(ib, tb, int(fd))
        ids_l.append(ids)
        tfs_l.append(tfs)
    ids = np.concatenate(ids_l)
    tfs = np.concatenate(tfs_l)
    stream = b"".join(x for x in post["pos_bytes"] if x)
    if not stream:
        raise LookupError("index has no positions")
    flat_pos, occ_off = decode_positions(stream, tfs)
    return ids, tfs, flat_pos, occ_off


def _occ_keys(
    ids: np.ndarray, tfs: np.ndarray, flat_pos: np.ndarray, occ_off: np.ndarray,
    cand: np.ndarray,
) -> np.ndarray:
    """Occurrence keys ``dense_doc << 32 | pos`` restricted to candidate
    docs (cand sorted ascending). Output is sorted (docs ascending,
    positions ascending within doc)."""
    pos_idx = np.searchsorted(cand, ids)
    sel = (pos_idx < len(cand)) & (cand[np.minimum(pos_idx, len(cand) - 1)] == ids)
    if not sel.any():
        return np.zeros(0, dtype=np.int64)
    sel_i = np.nonzero(sel)[0]
    lens = tfs[sel_i]
    total = int(lens.sum())
    out_starts = np.r_[0, np.cumsum(lens)[:-1]]
    gather = (
        np.repeat(occ_off[sel_i], lens) + np.arange(total) - np.repeat(out_starts, lens)
    )
    occ_pos = flat_pos[gather]
    occ_dense = np.repeat(pos_idx[sel_i], lens)
    return (occ_dense.astype(np.int64) << _POS_BITS) | occ_pos.astype(np.int64)


def _ordered_chain_verified(key_lists: list[np.ndarray], max_total_gap: int) -> np.ndarray:
    """Dense doc indices with an ordered occurrence chain of total internal
    gap ≤ max_total_gap (< 0 = unbounded). Vectorized greedy sweep."""
    n = len(key_lists)
    cur = key_lists[0]
    if len(cur) == 0:
        return np.zeros(0, dtype=np.int64)
    start_doc = cur >> _POS_BITS
    alive = np.ones(len(cur), dtype=bool)
    for keys in key_lists[1:]:
        if len(keys) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = np.searchsorted(keys, cur, side="right")
        ok = idx < len(keys)
        nxt = keys[np.minimum(idx, len(keys) - 1)]
        ok &= (nxt >> _POS_BITS) == start_doc
        alive &= ok
        cur = np.where(ok, nxt, cur)
    width = (cur & _POS_MASK) - (key_lists[0] & _POS_MASK)
    match = alive & ((max_total_gap < 0) | (width - (n - 1) <= max_total_gap))
    return np.unique(start_doc[match])


def _unordered_window_verified(
    key_lists: list[np.ndarray], max_gaps: int, thresholds: list[int] | None = None
) -> np.ndarray:
    """Dense doc indices containing a window with ≥ thresholds[i]
    occurrences of list i and width - (n_required-1) ≤ max_gaps (< 0 =
    unbounded). A duplicated query term is ONE list with threshold =
    multiplicity (distinct occurrences required; positions of distinct
    terms never collide — one token is one term). Per-doc two-pointer
    sweep over the merged occurrence sequence."""
    nl = len(key_lists)
    thr = np.array(thresholds if thresholds is not None else [1] * nl, dtype=np.int64)
    n_required = int(thr.sum())
    ev_keys = np.concatenate(key_lists)
    ev_list = np.concatenate([np.full(len(kk), i, dtype=np.int32) for i, kk in enumerate(key_lists)])
    order = np.argsort(ev_keys, kind="mergesort")
    ev_keys, ev_list = ev_keys[order], ev_list[order]
    docs = ev_keys >> _POS_BITS
    out = []
    for d in np.unique(docs):
        m = docs == d
        pos = (ev_keys[m] & _POS_MASK).astype(np.int64)
        lab = ev_list[m]
        have = np.zeros(nl, dtype=np.int64)
        lo = 0
        satisfied = 0
        hit = False
        for hi in range(len(pos)):
            have[lab[hi]] += 1
            if have[lab[hi]] == thr[lab[hi]]:
                satisfied += 1
            while satisfied == nl:
                width = pos[hi] - pos[lo]
                if max_gaps < 0 or width - (n_required - 1) <= max_gaps:
                    hit = True
                    break
                if have[lab[lo]] == thr[lab[lo]]:
                    satisfied -= 1
                have[lab[lo]] -= 1
                lo += 1
            if hit:
                break
        if hit:
            out.append(int(d))
    return np.array(out, dtype=np.int64)


def _segment_positional_scorer(
    index_dir: str,
    weights: dict[str, tuple[float, int]],
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    terms: list[str],
    expansions: list[str],
    ordered: bool,
    max_total_gap: int,
):
    """mapInPandas fn over a seg-id frame: per segment, decode the query
    terms' postings WITH positions (parquet term-filter pushdown), verify
    positionally, score verified docs by the BM25 term sum, emit ≤k rows.

    ``expansions`` non-empty = phrase_prefix: the LAST slot's occurrence
    list is the union of the expansion terms' occurrences (Lucene's
    MultiPhraseQuery position union), and matched expansions contribute
    their own BM25 terms to the score."""
    import pyarrow.parquet as pq

    from ..functions.smallfloat import byte4_to_int

    slot_terms: list[list[str]] = [[t] for t in terms] + ([expansions] if expansions else [])
    fetch_terms = sorted({t for st in slot_terms for t in st})

    def fn(batches):
        from .ops import seg_tombstones

        for pdf in batches:
            outs = []
            for seg in pdf["seg"]:
                d = store.seg_dir(index_dir, int(seg))
                tomb = seg_tombstones(index_dir, d)
                post = pq.read_table(
                    os.path.join(d, "postings.parquet"),
                    columns=["term", "first_doc_id", "ids_bytes", "tf_bytes", "pos_bytes"],
                    filters=[("term", "in", fetch_terms)],
                ).to_pandas()
                if len(post) == 0:
                    continue
                present = set(post["term"])
                if any(not (set(st) & present) for st in slot_terms):
                    continue  # conjunction can't match in this segment
                decoded = {t: _decode_term(post[post["term"] == t]) for t in present}

                # candidate docs: in every slot (union of the slot's terms)
                cand = None
                for st in slot_terms:
                    slot_ids = np.unique(np.concatenate(
                        [decoded[t][0] for t in st if t in decoded]
                    ))
                    cand = slot_ids if cand is None else np.intersect1d(cand, slot_ids, assume_unique=True)
                    if len(cand) == 0:
                        break
                if cand is None or len(cand) == 0:
                    continue
                if len(tomb):
                    pos = np.searchsorted(tomb, cand)
                    dead = (pos < len(tomb)) & (tomb[np.minimum(pos, len(tomb) - 1)] == cand)
                    cand = cand[~dead]
                    if len(cand) == 0:
                        continue

                key_lists = []
                for st in slot_terms:
                    ks = [
                        _occ_keys(*decoded[t], cand) for t in st if t in decoded
                    ]
                    ks = [x for x in ks if len(x)]
                    if not ks:
                        key_lists.append(np.zeros(0, dtype=np.int64))
                    elif len(ks) == 1:
                        key_lists.append(ks[0])
                    else:
                        key_lists.append(np.sort(np.concatenate(ks)))
                if ordered:
                    v_dense = _ordered_chain_verified(key_lists, max_total_gap)
                else:
                    # duplicate query terms → one list with threshold =
                    # multiplicity (intervals slots are single terms)
                    mult: dict[str, int] = {}
                    for st in slot_terms:
                        mult[st[0]] = mult.get(st[0], 0) + 1
                    uniq_lists, thrs = [], []
                    seen: set[str] = set()
                    for i, st in enumerate(slot_terms):
                        if st[0] in seen:
                            continue
                        seen.add(st[0])
                        uniq_lists.append(key_lists[i])
                        thrs.append(mult[st[0]])
                    v_dense = _unordered_window_verified(uniq_lists, max_total_gap, thrs)
                if len(v_dense) == 0:
                    continue
                verified = cand[v_dense]

                # score verified docs: BM25 sum over every matched query /
                # expansion term (weights are GLOBAL df stats)
                docs_t = pq.read_table(
                    os.path.join(d, "docs.parquet"), columns=["doc_id", "norm"]
                )
                nd = docs_t["doc_id"].to_numpy()
                order = np.argsort(nd, kind="mergesort")
                nd = nd[order]
                nq = byte4_to_int(docs_t["norm"].to_numpy())[order]
                ql = nq[np.searchsorted(nd, verified)].astype(np.float64)
                scores = np.zeros(len(verified), dtype=np.float64)
                for t in dict.fromkeys(t for st in slot_terms for t in st):
                    if t not in decoded or t not in weights:
                        continue
                    ids, tfs = decoded[t][0], decoded[t][1]
                    p = np.searchsorted(ids, verified)
                    ok = (p < len(ids)) & (ids[np.minimum(p, len(ids) - 1)] == verified)
                    tf_v = np.where(ok, tfs[np.minimum(p, len(ids) - 1)], 0).astype(np.float64)
                    scores += weights[t][0] * bm25.tf_norm(tf_v, ql, avgdl, k1, b)
                idx = np.lexsort((verified, -scores))[:k]
                outs.append(pd.DataFrame({
                    "doc_id": verified[idx],
                    "score": scores[idx],
                    "n_terms_matched": np.full(len(idx), len(slot_terms), dtype=np.int32),
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return fn


def _positional_topk(
    spark: SparkSession,
    index_dir: str,
    meta: store.IndexMeta,
    terms: list[str],
    expansions: list[str],
    k: int,
    ordered: bool,
    max_total_gap: int,
    weights: dict[str, tuple[float, int]],
) -> DataFrame:
    """Distributed positional query phase + fetch: one task per segment,
    ≤k rows per task to the coordinator merge, broadcast fetch join."""
    segs = store.list_segs(index_dir)
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    if not segs:
        return empty
    fn = _segment_positional_scorer(
        index_dir, weights, meta.avgdl, meta.k1, meta.b, k,
        terms, expansions, ordered, max_total_gap,
    )
    n_tasks = max(1, min(len(segs), spark.sparkContext.defaultParallelism))
    # explicit-slice parallelize: same task layout as repartition(), minus
    # one Exchange stage per query
    seg_rdd = spark.sparkContext.parallelize([(int(s),) for s in segs], n_tasks)
    cands = spark.createDataFrame(seg_rdd, "seg int").mapInPandas(fn, CAND_SCHEMA)
    top = cands.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    docs = spark.read.parquet(*store.docs_glob(index_dir)).select("doc_id", "url")
    return (
        docs.join(F.broadcast(top), "doc_id")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )


# --------------------------------------------------------------------------
# public query surface
# --------------------------------------------------------------------------

def search_phrase(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    slop: int = 0,
    candidate_factor: int = 20,  # kept for API compat; unused (exact path)
) -> DataFrame:
    """match_phrase over the positional index: per-segment conjunction +
    position-chain verify + BM25 top-k (score DESC, doc_id ASC). Exact —
    every verified doc competes, not a candidate sample. Position-less
    legacy indexes fall back to re-analyzing candidates' stored text."""
    meta = store.IndexMeta.load(index_dir)
    terms = analysis.analyze(phrase, meta.analyzer)
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    if not terms:
        return empty
    weights = _term_weights(spark, index_dir, terms, meta)
    if any(t not in weights for t in terms):
        return empty  # conjunction with a zero-df term matches nothing
    if not index_has_positions(index_dir):
        # position-less segments (e.g. a merge over legacy sources that
        # dropped mixed positions): re-analyze candidates' stored text.
        # Detected DRIVER-side from the parquet footers — the positional
        # plan is lazy, so an executor-side LookupError at collect time
        # could never reach a driver try/except here
        return _phrase_fallback(spark, index_dir, meta, terms, k, slop)
    return _positional_topk(
        spark, index_dir, meta, terms, [], k, True, slop, weights
    )


def search_phrase_prefix(
    spark: SparkSession,
    index_dir: str,
    phrase: str,
    k: int = 10,
    slop: int = 0,
    max_expansions: int = 50,
) -> DataFrame:
    """match_phrase_prefix (``MatchPhrasePrefixQueryBuilder.java``): the
    last analyzed token is a PREFIX expanded against the global term
    dictionary (first ``max_expansions`` in term order — the reference's
    expansion cap), and the phrase chain must end at one of the expansions'
    positions (MultiPhraseQuery position union). Scored as the BM25 sum of
    the fixed terms plus every matched expansion term."""
    meta = store.IndexMeta.load(index_dir)
    terms = analysis.analyze(phrase, meta.analyzer)
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    if not terms:
        return empty
    if not index_has_positions(index_dir):
        # the reference raises IllegalStateException ("field was indexed
        # without position data") — surface it driver-side, not as an
        # opaque executor traceback at collect time
        raise ValueError("match_phrase_prefix requires position data; a current segment has none")
    fixed, prefix = terms[:-1], terms[-1]
    # prefix expansion over the GLOBAL term dictionary (the stats table is
    # term-sorted parquet — range predicate pushes to row groups); capped
    # in term order so every segment task sees the same deterministic set
    exp_rows = (
        spark.read.parquet(store.term_stats_path(index_dir))
        .where(F.col("term").startswith(prefix))
        .orderBy("term")
        .limit(max_expansions)
        .collect()
    )
    expansions = [r["term"] for r in exp_rows]
    if not expansions:
        return empty
    weights = _term_weights(spark, index_dir, list(dict.fromkeys(fixed)) + expansions, meta)
    if any(t not in weights for t in fixed):
        return empty
    return _positional_topk(
        spark, index_dir, meta, fixed, expansions, k, True, slop, weights
    )


def search_intervals(
    spark: SparkSession,
    index_dir: str,
    text: str,
    ordered: bool = True,
    max_gaps: int = -1,
    k: int = 10,
    candidate_factor: int = 20,  # kept for API compat; unused (exact path)
) -> DataFrame:
    """intervals query (``IntervalQueryBuilder.java`` match source):
    an interval containing all terms, in order when ``ordered``, total
    internal gap ≤ max_gaps (-1 = unbounded). Distributed per-segment
    verify, BM25-ranked like phrase."""
    meta = store.IndexMeta.load(index_dir)
    terms = analysis.analyze(text, meta.analyzer)
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    if not terms:
        return empty
    weights = _term_weights(spark, index_dir, terms, meta)
    if any(t not in weights for t in terms):
        return empty
    if not index_has_positions(index_dir):
        raise ValueError("intervals requires position data; a current segment has none")
    return _positional_topk(
        spark, index_dir, meta, terms, [], k, ordered, max_gaps, weights
    )


# --------------------------------------------------------------------------
# legacy fallback (position-less index): re-analyze candidates' stored text
# --------------------------------------------------------------------------

def _phrase_verify_udf(terms: list[str], analyzer: str, slop: int):
    config = analysis.ANALYZER_CONFIGS.get(analyzer)

    @F.pandas_udf(BooleanType())
    def verify(texts: pd.Series) -> pd.Series:
        if analyzer not in analysis.ANALYZERS and config is not None:
            analysis.register_analyzer(analyzer, *config)
        fn = analysis.ANALYZERS[analyzer]

        def check(text: str) -> bool:
            toks = fn(text) if text else []
            pos = {t: np.array([i for i, x in enumerate(toks) if x == t], dtype=np.int64) for t in set(terms)}
            keys = [pos[t] for t in terms]
            if any(len(p) == 0 for p in keys):
                return False
            return len(_ordered_chain_verified(keys, slop)) > 0

        return texts.map(check)

    return verify


def _phrase_fallback(spark, index_dir, meta, terms, k, slop) -> DataFrame:
    from .topk import search_topk

    cands = search_topk(
        spark, index_dir, terms, k=k * 20, operator="and", fetch=False
    )
    docs = spark.read.parquet(*store.docs_glob(index_dir)).select("doc_id", "url", "text")
    verified = (
        docs.join(F.broadcast(cands), "doc_id")
        .where(_phrase_verify_udf(terms, meta.analyzer, slop)(F.col("text")))
    )
    return (
        verified.select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# test/introspection helper (NOT on the query path)
# --------------------------------------------------------------------------

def _index_positions(index_dir: str, terms: list[str], cand_ids: set[int]) -> dict[str, dict[int, np.ndarray]]:
    """Per term: {doc_id: ascending positions} for candidate docs, decoded
    straight from the postings blocks. Local introspection used by tests —
    the query path decodes positions inside the segment tasks instead."""
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


# --------------------------------------------------------------------------
# highlight fetch sub-phase
# --------------------------------------------------------------------------

def highlight(
    df: DataFrame,
    terms: list[str],
    text_col: str = "text",
    fragment_size: int = 100,
    pre_tag: str = "<em>",
    post_tag: str = "</em>",
    number_of_fragments: int = 1,
    no_match_size: int = 0,
) -> DataFrame:
    """Add a `highlight` column: fragments of ±fragment_size/2 chars around
    matching terms, matches wrapped in tags. Pure Column expressions
    (unified-highlighter-lite; ``server/.../fetch/subphase/highlight/``).
    ``number_of_fragments > 1`` emits an ARRAY of up to N fragments (one
    per match region, regex scan order — the reference's default scoring
    of fragments: fragments are SCORED by match count and returned
    best-first (the unified highlighter's passage scoring, ties broken by
    document order), still as pure Column expressions."""
    import re as _re

    # terms are analyzer OUTPUT, not regex: escape metacharacters ("c++",
    # "3.5") for the pattern, and escape the pattern again for embedding
    # in SQL string literals (expr parses \ and ' inside '...')
    pat = "|".join(_re.escape(t) for t in sorted(terms, key=len, reverse=True))
    sqlpat = pat.replace("\\", "\\\\").replace("'", "\\'")
    # HighlightBuilder.noMatchSize applies to every fragmentation mode:
    # non-matching docs highlight as NULL by default, or a leading snippet
    has_match = F.expr(f"lower({text_col}) rlike '(?i)(?:{sqlpat})'")
    no_match = (F.col(text_col).substr(F.lit(1), F.lit(no_match_size))
                if no_match_size > 0 else F.lit(None).cast("string"))
    if number_of_fragments == 0:
        # number_of_fragments: 0 (HighlightBuilder semantics): no
        # fragmentation — the ENTIRE field value returns with every match
        # wrapped
        tagged0 = F.regexp_replace(
            F.col(text_col), f"(?i)({pat})", f"{pre_tag}$1{post_tag}"
        )
        return df.withColumn(
            "highlight", F.when(has_match, tagged0).otherwise(no_match))
    if number_of_fragments > 1:
        half = fragment_size // 2
        ctx = f"(?i)[^\\\\n]{{0,{half}}}(?:{sqlpat})[^\\\\n]{{0,{half}}}"
        # rank candidate fragments by (-match_count, original_index): the
        # struct sort is JVM-side; slice keeps the best N
        ranked = F.expr(
            f"""transform(
                  array_sort(
                    transform(regexp_extract_all({text_col}, '{ctx}', 0),
                              (fr, i) -> struct(
                                -size(regexp_extract_all(fr, '(?i)(?:{sqlpat})', 0)) AS neg,
                                i AS ord, fr AS fr)
                    )
                  ),
                  s -> s.fr
                )"""
        )
        frags = F.slice(ranked, 1, number_of_fragments)
        tagged_arr = F.transform(
            frags, lambda fr: F.regexp_replace(fr, f"(?i)({pat})", f"{pre_tag}$1{post_tag}")
        )
        return df.withColumn(
            "highlight",
            F.when(has_match, tagged_arr).otherwise(
                F.array(no_match) if no_match_size > 0
                else F.lit(None).cast("array<string>")))
    # guard the empty extract: locate('', s) = 1 would read as a match
    matched_term = F.expr(
        f"regexp_extract(lower({text_col}), '(?i)({sqlpat})', 1)")
    first_pos = F.when(
        matched_term != "",
        F.expr(
            f"locate(regexp_extract(lower({text_col}), '(?i)({sqlpat})', 1), lower({text_col}))"
        ),
    ).otherwise(F.lit(0))
    half = fragment_size // 2
    frag_start = F.greatest(first_pos - half, F.lit(1))
    # HighlightBuilder.noMatchSize: fields without a match highlight as
    # NULL by default; no_match_size > 0 emits a leading snippet instead
    no_match = (F.col(text_col).substr(F.lit(1), F.lit(no_match_size))
                if no_match_size > 0 else F.lit(None).cast("string"))
    fragment = F.when(
        first_pos > 0,
        F.col(text_col).substr(frag_start, F.lit(fragment_size)),
    )
    tagged = F.coalesce(
        F.regexp_replace(fragment, f"(?i)({pat})", f"{pre_tag}$1{post_tag}"),
        no_match)
    return df.withColumn("highlight", tagged)
