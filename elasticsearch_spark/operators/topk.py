"""Top-k BM25 retrieval over the segment store.

Two physical strategies, both returning identical results (tested):

- ``naive``: decode every postings block of the query terms, score, and
  aggregate — the correctness reference.
- ``wand``: block-max WAND pruning (the reference's top-k path once
  ``track_total_hits`` (10000) is passed —
  ``server/.../search/query/TopDocsCollectorContext.java:211-216``; the
  block-max skipping itself lives in Lucene 9.1). Our formulation is
  region-at-a-time: doc-id space is cut at block boundaries into regions;
  each region's upper bound is the sum of the covering blocks' per-block
  score caps (idf·(k1+1)·maxtf/(maxtf+k1·(1−b+b·min_ql/avgdl))); regions are
  processed in descending upper-bound order with a bounded top-k heap and
  the scan STOPS at the first region whose bound can't beat the current
  k-th score. Everything inside a region is fully scored, so the stop is
  exact — rank-identical to naive.

Distribution model (SURVEY §3.1): per-segment scoring runs as one Spark
task via cogroup-applyInPandas (postings ⋈ norms on segment id) — the
"per-shard query phase"; each task emits ≤k candidates; the global
``orderBy(score desc, doc_id asc).limit(k)`` is the coordinator's k-way
merge (``SearchPhaseController.java:186-205``) with the reference's
deterministic tie-break. df/avgdl are read from the build-time stats
tables and shipped as broadcast locals — the dfs-phase determinism
mechanism (``DfsPhase.java:31-81``): scores never depend on partitioning.
"""

from __future__ import annotations

import heapq
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import bm25
from ..sources import index_store as store
from .codec import decode_block

CAND_SCHEMA = "doc_id long, score double, n_terms_matched int"


def _term_weights(spark: SparkSession, index_dir: str, terms: list[str], meta: store.IndexMeta) -> dict[str, tuple[float, int]]:
    """term -> (idf·(k1+1) weight, df). Tiny lookup (|terms| rows) against the
    build-time stats table; unseen terms get df=0 and drop out."""
    rows = (
        spark.read.parquet(store.term_stats_path(index_dir))
        .where(F.col("term").isin(terms))
        .collect()
    )
    out = {}
    for r in rows:
        w = float(bm25.idf(np.float64(r["df"]), meta.doc_count) * (meta.k1 + 1.0))
        out[r["term"]] = (w, int(r["df"]))
    return out


def _score_segment_arrays(
    post: pd.DataFrame,
    weights: dict[str, tuple[float, int]],
    norm_doc_ids: np.ndarray,
    norm_ql: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    allowed: np.ndarray | None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode + score all blocks in `post` → (doc_ids, scores, per-doc term counts)."""
    all_docs, all_scores = [], []
    for term, grp in post.groupby("term", sort=False):
        w = weights[term][0]
        ids_list, tf_list = [], []
        for fd, ib, tb in zip(grp["first_doc_id"], grp["ids_bytes"], grp["tf_bytes"]):
            ids, tfs = decode_block(ib, tb, int(fd))
            ids_list.append(ids)
            tf_list.append(tfs)
        ids = np.concatenate(ids_list)
        tfs = np.concatenate(tf_list)
        pos = np.searchsorted(norm_doc_ids, ids)
        ql = norm_ql[pos]
        s = w * bm25.tf_norm(tfs, ql, avgdl, k1, b)
        all_docs.append(ids)
        all_scores.append(s)
    docs = np.concatenate(all_docs)
    scores = np.concatenate(all_scores)
    if allowed is not None:
        if len(allowed) == 0:
            docs, scores = docs[:0], scores[:0]
        else:
            pos = np.searchsorted(allowed, docs)
            ok = (pos < len(allowed)) & (allowed[np.minimum(pos, len(allowed) - 1)] == docs)
            docs, scores = docs[ok], scores[ok]
    if len(docs) == 0:
        return docs, scores, np.zeros(0, dtype=np.int64)
    uniq, inv, counts = np.unique(docs, return_inverse=True, return_counts=True)
    summed = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(summed, inv, scores)
    return uniq, summed, counts


def _topk_from_arrays(docs, scores, counts, k, msm) -> pd.DataFrame:
    if msm > 1:
        keep = counts >= msm
        docs, scores, counts = docs[keep], scores[keep], counts[keep]
    if len(docs) > k:
        # bounded selection: score desc, doc_id asc tie-break
        idx = np.lexsort((docs, -scores))[:k]
    else:
        idx = np.lexsort((docs, -scores))
    return pd.DataFrame(
        {"doc_id": docs[idx], "score": scores[idx], "n_terms_matched": counts[idx].astype(np.int32)}
    )


def segment_scorer(
    weights: dict[str, tuple[float, int]],
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    msm: int,
    mode: str,
):
    """cogroup-applyInPandas fn: (postings of one segment, norms of one
    segment) → ≤k candidate rows."""

    def fn(post: pd.DataFrame, norms: pd.DataFrame) -> pd.DataFrame:
        if len(post) == 0 or len(norms) == 0:
            return pd.DataFrame({"doc_id": [], "score": [], "n_terms_matched": []}).astype(
                {"doc_id": "int64", "score": "float64", "n_terms_matched": "int32"}
            )
        nsort = np.argsort(norms["doc_id"].to_numpy(), kind="mergesort")
        norm_doc_ids = norms["doc_id"].to_numpy()[nsort]
        norm_ql = norms["ql"].to_numpy()[nsort]
        allowed = None
        if "allowed" in norms.columns:
            al = norms["allowed"].to_numpy()[nsort]
            allowed = norm_doc_ids[al.astype(bool)]
        if mode == "wand" and msm <= 1:
            return _wand_segment(post, weights, norm_doc_ids, norm_ql, avgdl, k1, b, k, allowed)
        docs, scores, counts = _score_segment_arrays(
            post, weights, norm_doc_ids, norm_ql, avgdl, k1, b, allowed
        )
        return _topk_from_arrays(docs, scores, counts, k, msm)

    return fn


def _wand_segment(post, weights, norm_doc_ids, norm_ql, avgdl, k1, b, k, allowed) -> pd.DataFrame:
    """Region-at-a-time block-max WAND within one segment."""
    terms = post["term"].to_numpy()
    first = post["first_doc_id"].to_numpy()
    last = post["last_doc_id"].to_numpy()
    w = np.array([weights[t][0] for t in terms], dtype=np.float64)
    max_tf = post["max_tf"].to_numpy().astype(np.float64)
    min_ql = post["min_ql"].to_numpy().astype(np.float64)
    ub = w * (max_tf / (max_tf + k1 * (1.0 - b + b * min_ql / avgdl)))

    # regions: cut doc space at block starts; a block [first,last] covers
    # regions [idx(first), idx_of_region_containing(last)]
    bounds = np.unique(first)
    r_of_first = np.searchsorted(bounds, first)
    r_of_last = np.searchsorted(bounds, last, side="right") - 1
    n_regions = len(bounds)
    ub_region = np.zeros(n_regions + 1, dtype=np.float64)
    np.add.at(ub_region, r_of_first, ub)
    np.subtract.at(ub_region, r_of_last + 1, ub)
    ub_region = np.cumsum(ub_region[:-1])

    region_order = np.argsort(-ub_region, kind="mergesort")

    # lazily decoded per-block postings, scored once
    n_blocks = len(post)
    b_ids: list[np.ndarray | None] = [None] * n_blocks
    b_scores: list[np.ndarray | None] = [None] * n_blocks
    ids_bytes = post["ids_bytes"].to_numpy()
    tf_bytes = post["tf_bytes"].to_numpy()

    # blocks grouped by covering region via interval list
    blocks_by_region: list[list[int]] = [[] for _ in range(n_regions)]
    for i in range(n_blocks):
        for r in range(r_of_first[i], r_of_last[i] + 1):
            blocks_by_region[r].append(i)

    heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap of top-k
    out_docs, out_scores, out_counts = [], [], []

    for r in region_order:
        theta = heap[0][0] if len(heap) >= k else -np.inf
        if ub_region[r] < theta and len(heap) >= k:
            # exact stop: no remaining region can beat the k-th score.
            # Strictly-below only — a region whose bound EQUALS theta can
            # still hold a doc that attains it with a smaller doc_id, which
            # wins the (score desc, doc_id asc) tie-break vs the naive path.
            break
        lo = bounds[r]
        hi = bounds[r + 1] if r + 1 < n_regions else np.iinfo(np.int64).max
        docs_acc, score_acc = [], []
        for i in blocks_by_region[r]:
            if b_ids[i] is None:
                ids, tfs = decode_block(ids_bytes[i], tf_bytes[i], int(first[i]))
                pos = np.searchsorted(norm_doc_ids, ids)
                ql = norm_ql[pos]
                b_ids[i] = ids
                b_scores[i] = w[i] * bm25.tf_norm(tfs, ql, avgdl, k1, b)
            ids, sc = b_ids[i], b_scores[i]
            s0, s1 = np.searchsorted(ids, lo), np.searchsorted(ids, hi)
            docs_acc.append(ids[s0:s1])
            score_acc.append(sc[s0:s1])
        if not docs_acc:
            continue
        docs = np.concatenate(docs_acc)
        scores = np.concatenate(score_acc)
        if allowed is not None and len(docs):
            if len(allowed) == 0:
                docs, scores = docs[:0], scores[:0]
            else:
                pos = np.searchsorted(allowed, docs)
                ok = (pos < len(allowed)) & (allowed[np.minimum(pos, len(allowed) - 1)] == docs)
                docs, scores = docs[ok], scores[ok]
        if len(docs) == 0:
            continue
        uniq, inv, counts = np.unique(docs, return_inverse=True, return_counts=True)
        summed = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(summed, inv, scores)
        for d, s, c in zip(uniq, summed, counts):
            item = (float(s), -int(d), int(c))
            if len(heap) < k:
                heapq.heappush(heap, item)
            elif item > heap[0]:
                heapq.heapreplace(heap, item)

    for s, nd, c in heap:
        out_docs.append(-nd)
        out_scores.append(s)
        out_counts.append(c)
    return pd.DataFrame(
        {
            "doc_id": np.array(out_docs, dtype=np.int64),
            "score": np.array(out_scores, dtype=np.float64),
            "n_terms_matched": np.array(out_counts, dtype=np.int32),
        }
    )


class IndexReader:
    """Open index handle: caches the postings/docs frames and term-stats in
    memory across queries — the Spark analog of ES keeping segment readers
    open (and the OS page cache warm) between searches. At serving scale the
    cache level is ``MEMORY_AND_DISK`` per executor; the frames stay
    partitioned by segment so the per-query cogroup shuffles only cached
    compact blocks, never the raw corpus."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.meta = store.IndexMeta.load(index_dir)
        self.postings = spark.read.parquet(*store.postings_glob(index_dir)).select(
            "term", "seg_id", "first_doc_id", "last_doc_id", "n",
            "max_tf", "min_ql", "ids_bytes", "tf_bytes",
        ).persist()
        self.docs = spark.read.parquet(*store.docs_glob(index_dir)).persist()
        # term stats: LAZY per-term lookup with a cache — at web scale the
        # term dictionary is 10^8-10^9 rows, so the reader never collects
        # the whole table; each query pulls only its own terms (term IN
        # (...) pushes to the term-sorted parquet row groups), exactly the
        # DfsPhase's per-query stats round-trip, and hot terms amortize to
        # zero via the cache
        self._stats_df = spark.read.parquet(store.term_stats_path(index_dir))
        self._stats: dict[str, tuple[int, int] | None] = {}

    def term_weights(self, terms: list[str]) -> dict[str, tuple[float, int]]:
        missing = [t for t in terms if t not in self._stats]
        if missing:
            rows = self._stats_df.where(F.col("term").isin(missing)).collect()
            found = {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}
            for t in missing:
                self._stats[t] = found.get(t)  # None = zero-df, cached too
        out = {}
        for t in terms:
            st = self._stats.get(t)
            if st is not None:
                df = st[0]
                w = float(bm25.idf(np.float64(df), self.meta.doc_count) * (self.meta.k1 + 1.0))
                out[t] = (w, df)
        return out

    def close(self) -> None:
        self.postings.unpersist()
        self.docs.unpersist()


def _segment_task_scorer(
    index_dir: str,
    weights: dict[str, tuple[float, int]],
    avgdl: float,
    k1: float,
    b: float,
    k: int,
    msm: int,
    mode: str,
):
    """mapInPandas fn over a seg-id frame: each task reads ITS segment's
    postings (parquet predicate+column pushdown on the term-sorted file)
    and norms directly from the store — the per-shard query phase with
    ZERO shuffle (the reference's one-collector-per-shard model,
    ``QueryPhase.java:98``). Tail terms cost ~nothing per non-matching
    segment: the term filter prunes on row-group stats."""
    import pyarrow.parquet as pq

    from ..functions.smallfloat import byte4_to_int

    live = list(weights)

    def fn(batches):
        # liveDocs mask: tombstoned ids (delete / superseded-version) are
        # excluded from scoring — each segment range-reads ONLY its own
        # tombstone slice (footer-stats range + row-group pruning), so a
        # giant delete_by_query never becomes a per-task memory tax
        from .ops import seg_tombstones

        for pdf in batches:
            outs = []
            for seg in pdf["seg"]:
                d = store.seg_dir(index_dir, int(seg))
                tomb = seg_tombstones(index_dir, d)
                post = pq.read_table(
                    os.path.join(d, "postings.parquet"),
                    columns=["term", "first_doc_id", "last_doc_id", "n",
                             "max_tf", "min_ql", "ids_bytes", "tf_bytes"],
                    filters=[("term", "in", live)],
                ).to_pandas()
                if len(post) == 0:
                    continue
                docs = pq.read_table(
                    os.path.join(d, "docs.parquet"), columns=["doc_id", "norm"]
                )
                norm_doc_ids = docs["doc_id"].to_numpy()
                order = np.argsort(norm_doc_ids, kind="mergesort")
                norm_doc_ids = norm_doc_ids[order]
                norm_ql = byte4_to_int(docs["norm"].to_numpy())[order]
                allowed = None
                if len(tomb):
                    pos = np.searchsorted(tomb, norm_doc_ids)
                    dead = (pos < len(tomb)) & (tomb[np.minimum(pos, len(tomb) - 1)] == norm_doc_ids)
                    if dead.any():
                        allowed = norm_doc_ids[~dead]
                if mode == "wand" and msm <= 1:
                    outs.append(
                        _wand_segment(post, weights, norm_doc_ids, norm_ql, avgdl, k1, b, k, allowed)
                    )
                else:
                    docs_a, scores_a, counts_a = _score_segment_arrays(
                        post, weights, norm_doc_ids, norm_ql, avgdl, k1, b, allowed
                    )
                    outs.append(_topk_from_arrays(docs_a, scores_a, counts_a, k, msm))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return fn


def routing_shard(spark: SparkSession, value: str, num_shards: int) -> int:
    """Shard for a routing value (IndexRouting.java's murmur3 analog):
    ``pmod(xxhash64(v), S)`` — identical to the build partition's
    ``pmod(xxhash64(v), P) % S`` because S divides P. Evaluated as a Spark
    constant expression so query- and index-time hashing can never drift
    (constant-folded: no job is run)."""
    row = spark.range(1).select(
        F.pmod(F.xxhash64(F.lit(value)), F.lit(num_shards)).cast("int").alias("s")
    ).first()
    return int(row["s"])


def routed_segs(
    spark: SparkSession,
    index_dir: str,
    segs: list[int],
    routing: str,
    meta: store.IndexMeta,
) -> list[int]:
    """Prune a segment list to the routing value's shard. Unknown-shard
    segments (pre-sharding merges) are kept — they may contain the
    shard's docs."""
    if not meta.num_shards:
        raise ValueError(
            "routing requires an index built with num_shards "
            "(the number_of_shards index setting)"
        )
    shard = routing_shard(spark, routing, meta.num_shards)
    return [
        s
        for s in segs
        if store.shard_of(index_dir, s, meta) in (shard, None)
    ]


def search_topk(
    spark: SparkSession,
    index_dir: str,
    query_terms: list[str],
    k: int = 10,
    operator: str = "or",
    minimum_should_match: int | None = None,
    mode: str = "wand",
    doc_filter=None,
    fetch: bool = True,
    reader: IndexReader | None = None,
    pit_segs: list[int] | None = None,
    routing: str | None = None,
) -> DataFrame:
    """Multi-term BM25 top-k over the index (query-then-fetch lifecycle).

    doc_filter: optional fn(docs_df) -> Column — the bool.filter context,
    evaluated on the docs table (unscored, like the reference's filter
    clauses), restricting which docs may match.

    pit_segs: optional pinned segment list (a point-in-time reader —
    segments are immutable, so pinning the set at open time gives
    repeatable reads across concurrent bulks, the reference's PIT
    contract).

    routing: optional routing value (``?routing=`` — IndexRouting.java):
    only segments of the value's shard (plus unknown-shard segments) are
    scanned — query cost drops from O(segments) to O(segments/P), the
    shard-pruning the reference gets by sending the search to one shard.
    Shard-aware tiered merge keeps merged segments prunable."""
    meta = reader.meta if reader else store.IndexMeta.load(index_dir)
    terms = list(dict.fromkeys(query_terms))
    weights = (
        reader.term_weights(terms) if reader else _term_weights(spark, index_dir, terms, meta)
    )
    live = [t for t in terms if t in weights]
    msm = len(live) if operator == "and" else int(minimum_should_match or 1)
    empty = spark.createDataFrame([], CAND_SCHEMA)
    if not live or (operator == "and" and len(live) < len(terms)):
        cands = empty
    elif doc_filter is None:
        # file-direct per-segment query phase (default): one task per
        # segment, zero shuffle — each task reads its own postings (term
        # filter pushed to parquet row groups) and norms from the store
        segs = pit_segs if pit_segs is not None else store.list_segs(index_dir)
        if routing is not None:
            segs = routed_segs(spark, index_dir, segs, routing, meta)
        fn = _segment_task_scorer(index_dir, weights, meta.avgdl, meta.k1, meta.b, k, msm, mode)
        n_tasks = max(1, min(len(segs), spark.sparkContext.defaultParallelism))
        # parallelize with an explicit slice count instead of
        # createDataFrame().repartition(): same task layout, one fewer
        # Exchange stage per query (~100-200 ms of scheduler latency saved
        # on every search)
        seg_rdd = spark.sparkContext.parallelize([(int(s),) for s in segs], n_tasks)
        cands = spark.createDataFrame(seg_rdd, "seg int").mapInPandas(fn, CAND_SCHEMA)
    else:
        # same segment pinning/pruning as the fast path: a PIT or routing
        # value must narrow the filtered search too, or a filtered PIT
        # search would read segments published after the PIT was opened
        segs = pit_segs if pit_segs is not None else store.list_segs(index_dir)
        if routing is not None:
            segs = routed_segs(spark, index_dir, segs, routing, meta)
        if not segs:
            cands = empty
            top = cands.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
            if not fetch:
                return top
            docs = (reader.docs if reader else spark.read.parquet(*store.docs_glob(index_dir))).select(
                "doc_id", "url", "lang", "warc_ts"
            )
            return docs.join(F.broadcast(top), "doc_id")
        pinned = pit_segs is not None or routing is not None
        if reader is not None:
            base_postings = reader.postings
            docs = reader.docs
            if pinned:
                seg_ids = [int(s) for s in segs]
                base_postings = base_postings.where(F.col("seg_id").isin(seg_ids))
                docs = docs.where(F.col("seg_id").isin(seg_ids))
        else:
            base_postings = spark.read.parquet(*[
                os.path.join(store.seg_dir(index_dir, s), "postings.parquet") for s in segs
            ]).select(
                "term", "seg_id", "first_doc_id", "last_doc_id", "n",
                "max_tf", "min_ql", "ids_bytes", "tf_bytes",
            )
            docs = spark.read.parquet(*[
                os.path.join(store.seg_dir(index_dir, s), "docs.parquet") for s in segs
            ])
        postings = base_postings.where(F.col("term").isin(live))
        from .ops import mask_tombstones

        docs = mask_tombstones(spark, index_dir, docs)
        seg_map = {int(c): cur for c, cur in ((int(x), meta.current_seg(int(x))) for x in meta.seg_map)} if meta.seg_map else {}
        cur_seg = F.col("seg_id")
        if seg_map:
            mapping = F.create_map(*[F.lit(x) for kv in seg_map.items() for x in kv])
            cur_seg = F.coalesce(mapping[F.col("seg_id")], F.col("seg_id"))
        norm_cols = [
            cur_seg.alias("cseg"),
            F.col("doc_id"),
            F.expr(f"({bm25.sql_quantized_dl_expr('dl')})").cast("long").alias("ql"),
        ]
        if doc_filter is not None:
            # bool.filter context: evaluated on the docs table, unscored
            norm_cols.append(doc_filter(docs).cast("boolean").alias("allowed"))
        norms = docs.select(*norm_cols)
        postings = postings.withColumn("cseg", cur_seg if not seg_map else F.coalesce(mapping[F.col("seg_id")], F.col("seg_id")))
        # can_match analog (CanMatchPreFilterSearchPhase.java:66): only ship
        # norms of segments that actually contain a query term — for tail
        # queries this prunes most of the docs-table scan
        live_segs = [r["cseg"] for r in postings.select("cseg").distinct().collect()]
        norms = norms.where(F.col("cseg").isin(live_segs))
        fn = segment_scorer(weights, meta.avgdl, meta.k1, meta.b, k, msm, mode)
        cands = (
            postings.groupBy("cseg")
            .cogroup(norms.groupBy("cseg"))
            .applyInPandas(lambda pl, nr: fn(pl, nr), CAND_SCHEMA)
        )
    top = cands.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    if not fetch:
        return top
    # fetch phase: ship the tiny global top-k back to the wide store and
    # broadcast-join (the second round-trip of query_then_fetch,
    # FetchSearchPhase.java / FetchPhase.java:62)
    docs = (reader.docs if reader else spark.read.parquet(*store.docs_glob(index_dir))).select(
        "doc_id", "url", "lang", "warc_ts"
    )
    return docs.join(F.broadcast(top), "doc_id").orderBy(F.desc("score"), F.asc("doc_id"))


MCAND_SCHEMA = "qid string, doc_id long, score double, n_terms_matched int"


def _segment_task_mscorer(
    index_dir: str,
    per_q: dict[str, tuple[list, int, str]],
    weights: dict[str, tuple[float, int]],
    avgdl: float,
    k1: float,
    b: float,
    k: int,
):
    """Batched variant of _segment_task_scorer: each segment task reads the
    UNION of every query's terms from its postings file ONCE (one parquet
    probe, one norms read, one tombstone mask), then runs the WAND / scored
    loop per query on the in-memory slice. per_q: qid -> (live_terms, msm,
    mode)."""
    import pyarrow.parquet as pq

    from ..functions.smallfloat import byte4_to_int

    live = sorted({t for terms, _, _ in per_q.values() for t in terms})

    def fn(batches):
        from .ops import seg_tombstones

        for pdf in batches:
            outs = []
            for seg in pdf["seg"]:
                d = store.seg_dir(index_dir, int(seg))
                tomb = seg_tombstones(index_dir, d)
                post = pq.read_table(
                    os.path.join(d, "postings.parquet"),
                    columns=["term", "first_doc_id", "last_doc_id", "n",
                             "max_tf", "min_ql", "ids_bytes", "tf_bytes"],
                    filters=[("term", "in", live)],
                ).to_pandas()
                if len(post) == 0:
                    continue
                docs = pq.read_table(
                    os.path.join(d, "docs.parquet"), columns=["doc_id", "norm"]
                )
                norm_doc_ids = docs["doc_id"].to_numpy()
                order = np.argsort(norm_doc_ids, kind="mergesort")
                norm_doc_ids = norm_doc_ids[order]
                norm_ql = byte4_to_int(docs["norm"].to_numpy())[order]
                allowed = None
                if len(tomb):
                    pos = np.searchsorted(tomb, norm_doc_ids)
                    dead = (pos < len(tomb)) & (tomb[np.minimum(pos, len(tomb) - 1)] == norm_doc_ids)
                    if dead.any():
                        allowed = norm_doc_ids[~dead]
                for qid, (terms, msm, mode) in per_q.items():
                    post_q = post[post["term"].isin(terms)]
                    if len(post_q) == 0:
                        continue
                    if mode == "wand" and msm <= 1:
                        r = _wand_segment(
                            post_q, weights, norm_doc_ids, norm_ql, avgdl, k1, b, k, allowed
                        )
                    else:
                        docs_a, scores_a, counts_a = _score_segment_arrays(
                            post_q, weights, norm_doc_ids, norm_ql, avgdl, k1, b, allowed
                        )
                        r = _topk_from_arrays(docs_a, scores_a, counts_a, k, msm)
                    if len(r):
                        r.insert(0, "qid", qid)
                        outs.append(r)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return fn


def msearch_topk(
    spark: SparkSession,
    index_dir: str,
    queries: dict[str, dict] | list[list[str]],
    k: int = 10,
    mode: str = "wand",
    reader: IndexReader | None = None,
    fetch: bool = False,
) -> DataFrame:
    """Batched _msearch at the postings layer: M top-k queries in ONE
    segment-task wave (one Spark job, not M) — per-query results identical
    to M search_topk calls, but scheduling overhead and the per-segment
    postings/norms/tombstone reads are amortized across the batch (the
    reference coordinates _msearch as one round the same way,
    ``TransportMultiSearchAction.java``).

    queries: {qid: {"terms": [...], "operator": "or"|"and",
    "minimum_should_match": int?}} or a plain list of term-lists
    (qids q0..qN-1). Returns (qid, doc_id, score, n_terms_matched) rows,
    per-qid top-k, plus fetch columns when fetch=True.
    """
    if isinstance(queries, list):
        queries = {f"q{i}": {"terms": t} for i, t in enumerate(queries)}
    meta = reader.meta if reader else store.IndexMeta.load(index_dir)
    all_terms = list(dict.fromkeys(t for q in queries.values() for t in q["terms"]))
    weights = (
        reader.term_weights(all_terms)
        if reader
        else _term_weights(spark, index_dir, all_terms, meta)
    )
    per_q: dict[str, tuple[list, int, str]] = {}
    for qid, q in queries.items():
        terms = list(dict.fromkeys(q["terms"]))
        live = [t for t in terms if t in weights]
        op = q.get("operator", "or")
        if not live or (op == "and" and len(live) < len(terms)):
            continue  # conjunctive query with a vocabulary miss: no hits
        msm = len(live) if op == "and" else int(q.get("minimum_should_match") or 1)
        per_q[qid] = (live, msm, mode)
    if not per_q:
        return spark.createDataFrame([], MCAND_SCHEMA)
    segs = store.list_segs(index_dir)
    fn = _segment_task_mscorer(index_dir, per_q, weights, meta.avgdl, meta.k1, meta.b, k)
    n_tasks = max(1, min(len(segs), spark.sparkContext.defaultParallelism))
    seg_rdd = spark.sparkContext.parallelize([(int(s),) for s in segs], n_tasks)
    cands = spark.createDataFrame(seg_rdd, "seg int").mapInPandas(fn, MCAND_SCHEMA)
    from pyspark.sql import Window

    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("doc_id"))
    top = (
        cands.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= k)
        .drop("__rk")
    )
    if not fetch:
        return top
    docs = (reader.docs if reader else spark.read.parquet(*store.docs_glob(index_dir))).select(
        "doc_id", "url", "lang", "warc_ts"
    )
    return docs.join(F.broadcast(top), "doc_id").orderBy(
        "qid", F.desc("score"), F.asc("doc_id")
    )


def sorted_scan(
    spark: SparkSession,
    index_dir: str,
    k: int = 10,
    columns: tuple = ("doc_id", "url", "warc_ts", "lang"),
) -> DataFrame:
    """Early-terminated sorted fetch over an index built with
    ``index_sort`` (Lucene index sorting, ``S/index/IndexSortConfig.java``
    + the sorted-query early-termination of ``CollectorManager``/
    ``TopFieldCollector``): each segment's docs.parquet is WRITTEN in
    index-sort order, so a segment task streams the file batch-by-batch
    (pyarrow ``iter_batches``) and STOPS after k live rows — at 100 TB a
    "latest-k" query reads O(k) rows per segment instead of scanning and
    sorting the table. The coordinator merge is an orderBy over ≤
    k·segments rows."""
    import pyarrow.parquet as pq_mod

    meta = store.IndexMeta.load(index_dir)
    if not meta.index_sort:
        raise ValueError("index was not built with index_sort")
    sfield, sorder = meta.index_sort
    segs = store.list_segs(index_dir)
    out_cols = list(dict.fromkeys(list(columns) + [sfield]))
    if segs:
        # real column types from the store footer — a hardcoded name→type
        # map would declare a numeric index_sort field (or any custom
        # stored column) as string, breaking the Arrow conversion or
        # mis-sorting '9' > '10' at the coordinator merge
        out_schema = spark.read.parquet(
            os.path.join(store.seg_dir(index_dir, segs[0]), "docs.parquet")
        ).select(*[F.col(f"`{c}`") for c in out_cols]).schema
    else:
        out_schema = ", ".join(f"`{c}` string" for c in out_cols)

    def fn(batches):
        from .ops import seg_tombstones

        for pdf in batches:
            for seg in pdf["seg"]:
                d = store.seg_dir(index_dir, int(seg))
                tomb = seg_tombstones(index_dir, d)
                pf = pq_mod.ParquetFile(os.path.join(d, "docs.parquet"))
                taken = []
                n_live = 0
                for batch in pf.iter_batches(batch_size=max(k, 128), columns=out_cols):
                    part = batch.to_pandas()
                    if len(tomb):
                        part = part[~part["doc_id"].isin(tomb)]
                    taken.append(part)
                    n_live += len(part)
                    if n_live >= k:
                        break  # early termination: later row groups unread
                if taken:
                    yield pd.concat(taken, ignore_index=True).head(k)

    segs_df = spark.createDataFrame([(int(s),) for s in segs], "seg int")
    n_tasks = max(1, min(len(segs), spark.sparkContext.defaultParallelism))
    per_seg = segs_df.repartition(n_tasks).mapInPandas(fn, out_schema)
    order = F.col(sfield).desc() if sorder == "desc" else F.col(sfield).asc()
    return per_seg.orderBy(order, F.asc("doc_id")).limit(k)
