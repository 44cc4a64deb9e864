"""Benchmark harness (driver-run per round; also the scaling-evidence tool).

Phases:
- ``index_build``: full indexing pipeline (generate pages → route →
  per-partition tokenize/postings/encode → segment files + stats tables)
  over a deterministic Common-Crawl-style pages table scaled by sf.
- ``wand_queries``: BM25 top-10 latency over the built index for a slice of
  the reference query set (disjunctive + conjunctive, block-max WAND).
- registry headline queries at $SPARK_GRAFT_SF_DIR (fulltext scoring, aggs,
  dedup, similarity).

Prints ONE JSON line:
  {"metric": "bench_total", "value": <sec>, "unit": "sec",
   "queries": {...}, "sf": <sf>, "index_docs_per_sec": ..., ...}

Scaling evidence (north rule): run twice on identical input,
  SPARK_GRAFT_CPUS=8 python bench.py   vs   SPARK_GRAFT_CPUS=32 python bench.py
and compare index_docs_per_sec (see BENCH/BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from elasticsearch_spark import registry  # noqa: E402
from elasticsearch_spark.operators.postings import build_index  # noqa: E402
from elasticsearch_spark.operators.topk import search_topk  # noqa: E402
from elasticsearch_spark.session import get_spark  # noqa: E402
from elasticsearch_spark.sources.pages import pages_df, query_set  # noqa: E402

REGISTRY_BENCH = [
    "match_or_bm25",
    "match_and_bm25",
    "agg_terms",
    "agg_date_histogram",
    "agg_significant_terms",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_exact_substring",
    "dedup_semdedup",
    "text_quality_classifier",
    "sim_cosine_topk",
    "sim_ann_lsh_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", str(max(20_000, int(1_000_000 * sf)))))
    # scaling runs MUST pin the partition count so both parallelism levels
    # run the identical job (same segments, same shuffle) — only the core
    # count varies; default follows cpus for the per-round bench
    index_parts = int(os.environ.get("SPARK_GRAFT_INDEX_PARTS", str(cpus * 2)))
    scaling_only = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "") == "1"
    spark = get_spark(
        app_name=f"bench-c{cpus}", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8)
    )
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    t_all = time.perf_counter()

    # --- phase 1: index build throughput -----------------------------------
    # input table is materialized once (same parquet bytes at every
    # parallelism level — the "index an existing table" semantics the north
    # rule measures); generation time is NOT in the build timing
    pages_path = f"/tmp/es_bench_pages_n{n_pages}"
    if not os.path.exists(pages_path + "/_SUCCESS"):
        pages_df(spark, n_pages, n_parts=64).write.mode("overwrite").parquet(pages_path)
    index_dir = f"/tmp/es_bench_index_c{cpus}_n{n_pages}"
    pages = spark.read.parquet(pages_path)
    # best-of-2: this VM shares a host and a single-shot build is hostage to
    # noisy-neighbor memory-bandwidth dips (see membw_probe below); two
    # builds of the SAME input bound that noise without changing what is
    # measured. Both runs are full builds; the index queried below is the
    # last one.
    t_build = float("inf")
    for _ in range(2):
        shutil.rmtree(index_dir, ignore_errors=True)
        t0 = time.perf_counter()
        info = build_index(spark, pages, index_dir, num_partitions=index_parts)
        t_build = min(t_build, time.perf_counter() - t0)
    timings["index_build"] = round(t_build, 3)
    docs_per_sec = info["doc_count"] / t_build

    # --- phase 2: WAND top-10 latency over the index -----------------------
    from elasticsearch_spark.operators.topk import IndexReader

    reader = IndexReader(spark, index_dir)
    qs = [q for q in query_set() if q.kind in ("disjunctive", "conjunctive")][:10]

    def run_wand(q):
        op = "and" if q.kind == "conjunctive" else "or"
        search_topk(
            spark, index_dir, list(q.terms), k=10, operator=op, mode="wand",
            fetch=False, reader=reader,
        ).collect()

    run_wand(qs[0])  # warm the reader cache + python workers (untimed)
    t0 = time.perf_counter()
    for q in qs:
        run_wand(q)
    timings["wand_queries_x10"] = round(time.perf_counter() - t0, 3)

    # same 10 queries as ONE batched msearch wave (result-identical;
    # amortizes the per-query job scheduling + per-segment reads)
    from elasticsearch_spark.operators.topk import msearch_topk

    batch = {
        f"q{i}": {
            "terms": list(q.terms),
            "operator": "and" if q.kind == "conjunctive" else "or",
        }
        for i, q in enumerate(qs)
    }
    t0 = time.perf_counter()
    msearch_topk(spark, index_dir, batch, k=10, mode="wand", reader=reader).collect()
    timings["wand_msearch_x10"] = round(time.perf_counter() - t0, 3)
    reader.close()

    # --- phase 2b: tiered segment merge (compaction) -----------------------
    merge_info = {}
    if not scaling_only:
        from elasticsearch_spark.operators.merge import merge_index

        t0 = time.perf_counter()
        merge_info = merge_index(spark, index_dir, segments_per_tier=8)
        timings["segment_merge"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        for q in qs[:3]:
            op = "and" if q.kind == "conjunctive" else "or"
            search_topk(spark, index_dir, list(q.terms), k=10, operator=op, mode="wand", fetch=False).collect()
        timings["wand_after_merge_x3"] = round(time.perf_counter() - t0, 3)

    # --- phase 3: registry headline queries at sf_dir ----------------------
    # each query runs twice; the warm (steady-state serving) timing is
    # reported — cold JVM/codegen noise is not the thing being measured
    for name in REGISTRY_BENCH if not scaling_only else []:
        fn = registry.QUERIES[name]
        fn(spark, sf_dir).collect()
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    # --- phase 4: percolator at stored-query scale -------------------------
    # 10k stored queries against the documents table through the
    # QueryAnalyzer-analog candidate path (operators/percolate.py): one
    # token pass + bounded driver compile, NOT Q/200 projection passes.
    percolate_pairs = 0
    if not scaling_only:
        from pyspark.sql import functions as F

        from elasticsearch_spark.operators.percolate import percolate

        # deterministic query set: mostly non-matching terms + a matching
        # tail, the alerting-rules shape at 10k-rule scale
        qrows = [(f"q{i}", json.dumps({"match": {"text": f"zzqx{i}"}}))
                 for i in range(9_900)]
        qrows += [(f"m{i}", json.dumps({"match": {"text": w}}))
                  for i, w in enumerate(
                      ["spark", "data", "search", "index", "query",
                       "cluster", "shard", "node", "text", "engine"] * 10)]
        qdf = spark.createDataFrame(qrows, "query_id string, query_json string")
        try:
            docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            t0 = time.perf_counter()
            percolate_pairs = percolate(docs, qdf, key="doc_id", prune=True).count()
            timings["percolate_10k_queries"] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the artifact if this phase breaks
            timings["percolate_10k_queries"] = -1.0
            print(f"percolate phase failed: {exc}", file=sys.stderr)

    total = time.perf_counter() - t_all

    # measurement-hygiene telemetry: this VM shares a host, and noisy
    # neighbors show up as memory-bandwidth collapse (tools/membw_probe.py).
    # Report the probe alongside the timings so a slow run is attributable:
    # healthy < ~2 s; the recorded reference numbers in BENCH/BASELINE.md
    # were measured at probe < 1 s.
    import numpy as _np

    _a = _np.zeros(200_000_000 // 8)
    _t0 = time.perf_counter()
    for _ in range(5):
        _a = _a + 1.0
    membw_probe_s = round(time.perf_counter() - _t0, 2)
    del _a

    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "membw_probe_s": membw_probe_s,
                "sf": sf,
                "cpus": cpus,
                "index_pages": n_pages,
                "index_docs": info["doc_count"],
                "index_docs_per_sec": round(docs_per_sec, 1),
                "index_postings_mb": round(info["postings_bytes"] / 1e6, 2),
                "merges": merge_info.get("merges", 0),
                "segments_after_merge": merge_info.get("segments_after", 0),
                "percolate_pairs": percolate_pairs,
            }
        )
    )


if __name__ == "__main__":
    main()
