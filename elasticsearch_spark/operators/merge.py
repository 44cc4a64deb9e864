"""Tiered segment merge (compaction) + salted global term-stats rebuild.

The Spark re-expression of the reference's background merge
(``server/src/main/java/org/elasticsearch/index/MergePolicyConfig.java:108-113``:
≤10 segments per tier, 5 GB max merged segment, 2 MB floor;
``server/.../index/EsTieredMergePolicy.java:24-33``). Semantics: segments
are immutable sorted runs; a merge selects a size-tier of segments and
sort-merges their postings on (term, docID) into one new segment —
docID spaces of distinct segments are disjoint by construction
(``doc_id = pid << 40 | row``), so the merge is a concat-in-docID-order
per term followed by a re-block + re-encode, exactly Lucene's merge of
postings iterators.

Execution model: one Spark task per merge group (``mapInPandas`` over a
group-spec frame) — each task reads the group's segment files from shared
storage, merges in numpy, writes the new segment, and commits a merge
manifest. At 100 TB scale this is the standard compaction-job shape: the
work is embarrassingly parallel across groups and each group is bounded by
``max_merged_bytes``.

Hot-term skew (north rule): the global term-stats rebuild aggregates
postings blocks with an EXPLICIT two-phase salted aggregation —
``groupBy(term, salt = pmod(seg_id, S))`` partial sums, then
``groupBy(term)`` final — so a stopword-scale term ("the" in 60% of docs)
never funnels all its block rows through one reducer. (The analog of the
reference spreading a hot routing key via ``routing_partition_size``,
``server/.../cluster/routing/IndexRouting.java:217-227``.)
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..sources import index_store as store
from .postings import encode_postings_blocks

# reference defaults, scaled for sandbox testing via parameters
SEGMENTS_PER_TIER = 10
MAX_MERGED_BYTES = 5 * 2**30
FLOOR_BYTES = 2 * 2**20

MERGED_SEG_BASE = store.MERGED_SEG_BASE  # merged segment ids live above build pids


def _seg_sizes(index_dir: str) -> dict[int, int]:
    """segment id -> postings file size in bytes, live segments only."""
    out = {}
    for s in store.list_segs(index_dir):
        p = os.path.join(store.seg_dir(index_dir, s), "postings.parquet")
        if os.path.exists(p):
            out[s] = os.path.getsize(p)
    return out


def plan_merges(
    index_dir: str,
    segments_per_tier: int = SEGMENTS_PER_TIER,
    max_merged_bytes: int = MAX_MERGED_BYTES,
    floor_bytes: int = FLOOR_BYTES,
) -> list[list[int]]:
    """Tiered merge selection: sort segments by size ascending (sizes below
    ``floor_bytes`` count as the floor, like the reference's floorSegmentMB);
    greedily group up to ``segments_per_tier`` adjacent segments whose
    combined size stays under ``max_merged_bytes``. Groups of one are not
    merged.

    Groups never cross routing shards (the reference merges within one
    shard by construction): segments are bucketed by ``store.shard_of``
    first, so merged segments stay shard-pure and routed searches keep
    their segment-pruning guarantee across compactions. Unknown-shard
    segments (pre-upgrade merges) form their own bucket."""
    sizes = _seg_sizes(index_dir)
    meta = store.IndexMeta.load(index_dir)
    shard_key = {s: store.shard_of(index_dir, s, meta) for s in sizes}
    order = sorted(
        sizes,
        key=lambda s: (
            -1 if shard_key[s] is None else shard_key[s],
            max(sizes[s], floor_bytes),
            s,
        ),
    )
    groups: list[list[int]] = []
    cur: list[int] = []
    cur_bytes = 0
    for seg in order:
        sz = max(sizes[seg], floor_bytes)
        if cur and (
            len(cur) >= segments_per_tier
            or cur_bytes + sz > max_merged_bytes
            or shard_key[seg] != shard_key[cur[-1]]
        ):
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(seg)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return [g for g in groups if len(g) > 1]


def merge_group_local(index_dir: str, segs: list[int], new_seg: int) -> dict:
    """Sort-merge one group of segments into ``seg=<new_seg>``. Pure local
    function (one Spark task; also unit-testable). Returns the merge
    manifest dict."""
    # docs: concat, keep sorted by doc_id (disjoint per-segment ranges) —
    # except under index sorting (IndexSortConfig.java), where the merged
    # docs file must be re-sorted on the sort field so sorted_scan's
    # early termination stays valid on merged segments (doc ids are
    # untouched; only the row order changes)
    docs_tables = [pq.read_table(os.path.join(store.seg_dir(index_dir, s), "docs.parquet")) for s in sorted(segs)]
    docs = pa.concat_tables(docs_tables)
    isort = store.IndexMeta.load(index_dir).index_sort
    if isort:
        sfield, sorder = isort
        d_sort = pa.compute.sort_indices(
            docs, sort_keys=[(sfield, "descending" if sorder == "desc" else "ascending"),
                             ("doc_id", "ascending")]
        )
    else:
        d_sort = pa.compute.sort_indices(docs["doc_id"])
    docs = docs.take(d_sort)

    # expunge deletes (the reference's merge purging masked docs): drop
    # tombstoned rows here; the caller reconciles the tombstone store after
    # commit. Range-read only this merge group's id span — a broad
    # delete_by_query never ships the full tombstone set to every task.
    from .ops import read_tombstones_range

    ids_all = docs["doc_id"].to_numpy()
    tomb = (read_tombstones_range(index_dir, int(ids_all.min()), int(ids_all.max()))
            if len(ids_all) else np.zeros(0, dtype=np.int64))
    expunged: list[int] = []
    if len(tomb):
        ids = docs["doc_id"].to_numpy()
        pos = np.searchsorted(tomb, ids)
        dead = (pos < len(tomb)) & (tomb[np.minimum(pos, len(tomb) - 1)] == ids)
        if dead.any():
            expunged = [int(x) for x in ids[dead]]
            docs = docs.filter(pa.array(~dead))
    seg_col = pa.array(np.full(docs.num_rows, new_seg, dtype=np.int32))
    docs = docs.set_column(docs.schema.get_field_index("seg_id"), "seg_id", seg_col)

    # ql lookup for min_ql block stats — docs rows may be index-sort
    # ordered, so sort the lookup arrays by doc_id explicitly
    from ..functions.smallfloat import byte4_to_int

    doc_ids_sorted = docs["doc_id"].to_numpy()
    _id_order = np.argsort(doc_ids_sorted, kind="mergesort")
    doc_ids_sorted = doc_ids_sorted[_id_order]
    ql_sorted = byte4_to_int(docs["norm"].to_numpy())[_id_order]

    # postings: decode all blocks → flat (term, doc_id, tf), lexsort, re-encode
    post_tables = [pq.read_table(os.path.join(store.seg_dir(index_dir, s), "postings.parquet")) for s in sorted(segs)]
    post = pa.concat_tables(post_tables)
    terms = post["term"].to_numpy(zero_copy_only=False)
    firsts = post["first_doc_id"].to_numpy()
    ids_b = post["ids_bytes"].to_numpy(zero_copy_only=False)
    tf_b = post["tf_bytes"].to_numpy(zero_copy_only=False)
    ns = post["n"].to_numpy()

    # whole-table vectorized decode: VByte is self-delimiting, so ALL block
    # byte-strings concatenate into one stream decoded in a single numpy
    # pass; per-block docIDs are reconstructed with a segmented cumsum
    # (gap[block_start] is 0 by the codec's layout, base = first_doc_id)
    from .codec import vbyte_decode

    n_total = int(ns.sum())
    starts = np.r_[0, np.cumsum(ns)[:-1]]
    gaps = vbyte_decode(b"".join(ids_b)).astype(np.int64)
    flat_tfs = vbyte_decode(b"".join(tf_b)).astype(np.int64)
    csum = np.cumsum(gaps)
    base_correction = firsts - (csum[starts] - gaps[starts])
    flat_ids = csum + np.repeat(base_correction, ns)
    # term codes WITHOUT hashing millions of strings: the dictionary is the
    # block-level term column (~1000× smaller) — unique it, map rows by
    # binary search, expand to postings by repeat
    global_terms = np.unique(terms)
    flat_codes = np.repeat(np.searchsorted(global_terms, terms), ns)
    assert len(flat_ids) == n_total

    # positions (if every source segment carries them): decode the whole
    # occurrence stream once; re-gathered after the postings reorder below
    from .postings import decode_positions

    flat_pos_all = None
    occ_off_all = None
    if "pos_bytes" in post.column_names:
        pos_b = post["pos_bytes"].to_numpy(zero_copy_only=False)
        stream = b"".join(x for x in pos_b if x is not None)
        flat_pos_all, occ_off_all = decode_positions(stream, flat_tfs)
        if len(flat_pos_all) != int(flat_tfs.sum()):
            flat_pos_all = None  # mixed/absent positions → merged without

    orig_tfs = flat_tfs
    if expunged:
        exp = np.sort(np.array(expunged, dtype=np.int64))
        pos = np.searchsorted(exp, flat_ids)
        keep = ~((pos < len(exp)) & (exp[np.minimum(pos, len(exp) - 1)] == flat_ids))
        sel = np.nonzero(keep)[0]
        flat_codes, flat_ids, flat_tfs = flat_codes[keep], flat_ids[keep], flat_tfs[keep]
    else:
        sel = np.arange(len(flat_ids))

    if len(flat_ids) == 0:
        from .postings import POSTINGS_FIELDS

        merged = pa.table({kname: pa.array([], type=t) for kname, t in POSTINGS_FIELDS})
    else:
        codes, uniques = flat_codes, global_terms
        order = np.lexsort((flat_ids, codes))
        p_code, p_docid, p_tfs = codes[order], flat_ids[order], flat_tfs[order]
        pos = np.searchsorted(doc_ids_sorted, p_docid)
        p_ql = ql_sorted[pos]
        flat_pos_new = None
        if flat_pos_all is not None:
            # gather the occurrence stream into the new posting order
            final_idx = sel[order]  # source posting per output posting
            lengths = orig_tfs[final_idx]
            out_total = int(lengths.sum())
            out_starts = np.r_[0, np.cumsum(lengths)[:-1]]
            gather = (
                np.repeat(occ_off_all[final_idx], lengths)
                + np.arange(out_total)
                - np.repeat(out_starts, lengths)
            )
            flat_pos_new = flat_pos_all[gather]
        merged = encode_postings_blocks(
            np.asarray(uniques, dtype=object), p_code, p_docid, p_tfs, p_ql, new_seg,
            flat_pos=flat_pos_new,
        )

    d = store.seg_dir(index_dir, new_seg)
    os.makedirs(d, exist_ok=True)
    for name, tbl in (("docs.parquet", docs), ("postings.parquet", merged)):
        tmp = os.path.join(d, f".{name}.tmp")
        pq.write_table(tbl, tmp, compression="zstd")
        os.replace(tmp, os.path.join(d, name))

    # record the group's routing shard (shard-pure by plan_merges) so
    # routed searches can prune merged segments in O(1)
    _meta = store.IndexMeta.load(index_dir)
    shards = {store.shard_of(index_dir, s, _meta) for s in segs}
    manifest = {
        "new_seg": new_seg,
        "merged_from": sorted(int(s) for s in segs),
        "shard": shards.pop() if len(shards) == 1 else None,
        "n_docs": int(docs.num_rows),
        "n_blocks": int(merged.num_rows),
        "postings_bytes": int(merged.nbytes),
        "status": "complete",
    }
    mdir = os.path.join(index_dir, "manifests")
    os.makedirs(mdir, exist_ok=True)
    mp = os.path.join(mdir, f"merge-{new_seg}.json")
    with open(mp + ".tmp", "w") as f:
        json.dump(manifest, f)
    os.replace(mp + ".tmp", mp)  # commit point: manifest rename

    # only after commit: drop the source segment dirs. A crash before this
    # leaves both copies on disk, but readers consult merge manifests
    # (store.list_segs excludes merged_from) and store.reconcile reclaims
    # the dirs on the next merge round. Failed deletes raise — a swallowed
    # failure here used to silently double-count.
    for s in segs:
        shutil.rmtree(store.seg_dir(index_dir, s))
    return manifest


def _folded_segs_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stats", "folded_segs.json")


def _read_folded_segs(index_dir: str) -> set[int]:
    # the authoritative copy commits ATOMICALLY with the stats table (a
    # `_`-prefixed sidecar inside the parquet dir — invisible to Spark);
    # the legacy standalone file is the fallback for older indexes
    for p in (
        os.path.join(store.term_stats_path(index_dir), "_folded_segs.json"),
        _folded_segs_path(index_dir),
    ):
        if os.path.exists(p):
            try:
                with open(p) as f:
                    return set(json.load(f))
            except (json.JSONDecodeError, OSError):
                continue
    return set()


def _recover_stats(index_dir: str) -> None:
    """Finish a stats swap a crash interrupted: the table is parked at
    `.old` between the two renames; restore it if the live path is gone."""
    ts_path = store.term_stats_path(index_dir)
    old_path = ts_path + ".old"
    if not os.path.exists(ts_path) and os.path.exists(old_path):
        os.replace(old_path, ts_path)


def _commit_stats(index_dir: str, tmp_path: str, folded: set[int]) -> None:
    """Atomically publish a freshly-written stats table TOGETHER with its
    folded-segment set: the set rides inside the parquet dir, so one
    rename commits both (a separate post-write folded file let a replayed
    micro-batch double-fold df/cf), and the old table parks at `.old`
    during the swap so no crash point loses it (the old rmtree-then-replace
    had a window with NO stats table on disk)."""
    ts_path = store.term_stats_path(index_dir)
    old_path = ts_path + ".old"
    with open(os.path.join(tmp_path, "_folded_segs.json"), "w") as f:
        json.dump(sorted(int(s) for s in folded), f)
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
    if os.path.exists(ts_path):
        os.replace(ts_path, old_path)
    os.replace(tmp_path, ts_path)  # commit point
    if os.path.exists(old_path):
        shutil.rmtree(old_path)
    # legacy location kept in sync for older readers
    _write_folded_segs(index_dir, set(folded))


def _write_folded_segs(index_dir: str, segs: set[int]) -> None:
    p = _folded_segs_path(index_dir)
    os.makedirs(os.path.dirname(p), exist_ok=True)
    with open(p + ".tmp", "w") as f:
        json.dump(sorted(segs), f)
    os.replace(p + ".tmp", p)


def rebuild_term_stats(spark: SparkSession, index_dir: str, num_salts: int = 16) -> None:
    """Global (term, df, cf) rebuild with explicit two-phase salted
    aggregation (hot-term skew handling, north rule)."""
    postings = spark.read.parquet(*store.postings_glob(index_dir))
    partial = (
        postings.groupBy("term", F.pmod(F.col("seg_id").cast("long"), F.lit(num_salts)).alias("salt"))
        .agg(F.sum("n").cast("long").alias("pdf"), F.sum("sum_tf").cast("long").alias("pcf"))
    )
    final = partial.groupBy("term").agg(
        F.sum("pdf").cast("long").alias("df"), F.sum("pcf").cast("long").alias("cf")
    )
    ts_path = store.term_stats_path(index_dir)
    tmp_path = ts_path + ".tmp"
    final.repartition(8, "term").sortWithinPartitions("term").write.mode("overwrite").parquet(tmp_path)
    _commit_stats(index_dir, tmp_path, set(store.list_segs(index_dir)))


def merge_term_stats(spark: SparkSession, index_dir: str, new_segs: list[int]) -> None:
    """INCREMENTAL (term, df, cf) update: fold only the NEW segments'
    postings partials into the existing stats table — per-batch cost is
    O(|vocab| + |new postings|), independent of total index size (a full
    ``rebuild_term_stats`` per streaming micro-batch is O(index), i.e.
    O(n²) over a day of streaming). Idempotent under micro-batch REPLAY
    (Structured Streaming may re-run a batch after a crash): segments
    already folded — tracked in ``stats/folded_segs.json``, committed
    after the stats write — are skipped."""
    _recover_stats(index_dir)
    folded = _read_folded_segs(index_dir)
    todo = [
        s for s in new_segs
        if s not in folded
        and os.path.exists(os.path.join(store.seg_dir(index_dir, s), "postings.parquet"))
    ]
    if not todo:
        return
    paths = [os.path.join(store.seg_dir(index_dir, s), "postings.parquet") for s in todo]
    new = (
        spark.read.parquet(*paths)
        .groupBy("term")
        .agg(F.sum("n").cast("long").alias("df"), F.sum("sum_tf").cast("long").alias("cf"))
    )
    ts_path = store.term_stats_path(index_dir)
    if os.path.exists(ts_path):
        old = spark.read.parquet(ts_path)
        merged = (
            old.unionByName(new)
            .groupBy("term")
            .agg(F.sum("df").cast("long").alias("df"), F.sum("cf").cast("long").alias("cf"))
        )
    else:
        merged = new
    tmp_path = ts_path + ".tmp"
    merged.repartition(8, "term").sortWithinPartitions("term").write.mode("overwrite").parquet(tmp_path)
    _commit_stats(index_dir, tmp_path, folded | set(todo))


def merge_index(
    spark: SparkSession,
    index_dir: str,
    segments_per_tier: int = SEGMENTS_PER_TIER,
    max_merged_bytes: int = MAX_MERGED_BYTES,
    floor_bytes: int = FLOOR_BYTES,
) -> dict:
    """Run one round of tiered compaction: plan groups → one Spark task per
    group → salted stats rebuild. Scores are unchanged by construction
    (df/avgdl are global, docIDs survive the merge verbatim)."""
    store.reconcile(index_dir)  # reclaim crash-leftover merged-away dirs
    groups = plan_merges(index_dir, segments_per_tier, max_merged_bytes, floor_bytes)
    if not groups:
        return {"merges": 0, "segments_after": len(_seg_sizes(index_dir))}
    existing_merged = [
        int(n.split("=", 1)[1])
        for n in os.listdir(os.path.join(index_dir, "segments"))
        if n.startswith("seg=") and int(n.split("=", 1)[1]) >= MERGED_SEG_BASE
    ]
    next_id = max(existing_merged, default=MERGED_SEG_BASE - 1) + 1
    specs = pd.DataFrame(
        {
            "gid": range(len(groups)),
            "new_seg": [next_id + i for i in range(len(groups))],
            "segs": [json.dumps(g) for g in groups],
        }
    )

    def run(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                m = merge_group_local(index_dir, json.loads(row["segs"]), int(row["new_seg"]))
                out.append({"new_seg": m["new_seg"], "n_docs": m["n_docs"], "n_blocks": m["n_blocks"]})
            yield pd.DataFrame(out)

    res = (
        spark.createDataFrame(specs)
        .repartition(len(groups), "gid")
        .mapInPandas(run, "new_seg int, n_docs long, n_blocks long")
        .collect()
    )
    rebuild_term_stats(spark, index_dir)

    # reconcile tombstones expunged by the merge (ids no longer in any
    # segment) — a fully distributed semi-join + clustered rewrite, never a
    # driver collect (delete-count-independent driver memory); deletes
    # stop counting after a merge, exactly the reference's behavior
    from .ops import reconcile_tombstones

    docs = spark.read.parquet(*store.docs_glob(index_dir))
    reconcile_tombstones(spark, index_dir, docs)
    meta = store.IndexMeta.load(index_dir)
    agg = docs.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).collect()[0]
    meta.doc_count = int(agg["n"])
    meta.sum_dl = int(agg["s"] or 0)
    meta.save(index_dir)
    return {
        "merges": len(res),
        "merged_docs": sum(r["n_docs"] for r in res),
        "segments_after": len(_seg_sizes(index_dir)),
    }
