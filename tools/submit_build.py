"""spark-submit entry point for a cluster index build — the north-rule
deployment shape:

    spark-submit --master <cluster> \\
        --py-files /tmp/elasticsearch_spark_pkg.zip \\
        tools/submit_build.py \\
        --input  <pages parquet/Iceberg path> \\
        --index  <shared-storage index dir> \\
        --partitions 4096 [--analyzer standard] [--merge]

The job is the full pipeline: read pages(url, warc_ts, html, text, lang) →
route by ``pmod(xxhash64(url), P)`` (one shuffle total) → per-partition
tokenize / postings build / delta+VByte encode → segment files + lineage
manifests (checkpoint-resume: re-running skips completed partitions) →
salted global term-stats aggregation → optional tiered merge round.

Sizing guidance (measured, BENCH/BASELINE.md): partitions of ~250 MB of
page text keep the per-core working set cache-resident — at 100 TB that is
~400k partitions across the cluster; oversplitting costs seconds per task,
undersplitting is superlinear. The build emits one JSON metrics line on
stdout (docs, docs/sec, bytes) for throughput tracking at each cluster size
(the N vs 4N executors scaling-efficiency criterion).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="pages table path (parquet dir)")
    ap.add_argument("--index", required=True, help="index output dir (shared storage)")
    ap.add_argument("--partitions", type=int, default=None,
                    help="shard count (default: executors*4)")
    ap.add_argument("--analyzer", default="standard")
    ap.add_argument("--merge", action="store_true", help="run one tiered merge round after build")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from elasticsearch_spark.operators.postings import build_index

    spark = SparkSession.builder.appName("es-spark-index-build").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    pages = spark.read.parquet(args.input)
    n_exec = max(int(spark.sparkContext.defaultParallelism), 1)
    parts = args.partitions or n_exec * 4

    t0 = time.time()
    info = build_index(spark, pages, args.index, num_partitions=parts, analyzer=args.analyzer)
    build_s = time.time() - t0

    merge_info = {}
    if args.merge:
        from elasticsearch_spark.operators.merge import merge_index

        t0 = time.time()
        merge_info = merge_index(spark, args.index)
        merge_info["merge_sec"] = round(time.time() - t0, 3)

    print(json.dumps({
        "doc_count": info["doc_count"],
        "built": info["built"],
        "skipped": info["skipped"],
        "build_sec": round(build_s, 3),
        "docs_per_sec": round(info["doc_count"] / build_s, 1),
        "postings_bytes": info["postings_bytes"],
        "partitions": parts,
        "parallelism": n_exec,
        **({"merge": merge_info} if merge_info else {}),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
