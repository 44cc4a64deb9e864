"""No-Spark scaling control: N independent OS processes each run the
IDENTICAL per-partition segment build (``build_segment_frames``) on its
own slice of pages — zero coordination, zero shuffle, no JVM. If
throughput stops scaling with N here, the ceiling is the BOX (shared
memory bus / hypervisor steal), not the Spark job structure.

Two modes:
- compute-only (default): the build kernel alone — isolates CPU/memory-bus
  scaling.
- ``--write``: each proc ALSO writes its segment's docs+postings parquet
  (zstd, fsync) to /tmp and reads the postings back — the full per-task
  I/O profile of the real build. All procs share ONE virtual block device
  here, so a degradation that appears only in this mode is the shared-disk
  ceiling, not the job structure (on a real cluster every executor brings
  its own disks, so this term scales with nodes).

Usage: python tools/bandwidth_control.py [--write] [n_procs ...]
(default: 2 8). Prints one line per level: procs, docs/sec, per-proc secs.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

DOCS_PER_PROC = 4000
WRITE_DIR = "/tmp/es_bw_control"


def _one(pid: int) -> float:
    from elasticsearch_spark.operators.postings import build_segment_frames
    from elasticsearch_spark.sources.pages import pages_pdf

    pdf = pages_pdf(DOCS_PER_PROC, start=pid * DOCS_PER_PROC)
    t = time.time()
    build_segment_frames(pdf, pid, "standard")
    return time.time() - t


def _one_write(pid: int) -> float:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from elasticsearch_spark.operators.postings import build_segment_frames
    from elasticsearch_spark.sources.pages import pages_pdf

    pdf = pages_pdf(DOCS_PER_PROC, start=pid * DOCS_PER_PROC)
    d = os.path.join(WRITE_DIR, f"seg_{pid}")
    os.makedirs(d, exist_ok=True)
    t = time.time()
    docs_pdf, postings, _ = build_segment_frames(pdf, pid, "standard")
    for name, tbl in (
        ("docs.parquet", pa.Table.from_pandas(docs_pdf, preserve_index=False)),
        ("postings.parquet", postings),
    ):
        path = os.path.join(d, name)
        pq.write_table(tbl, path, compression="zstd")
        fd = os.open(path, os.O_RDONLY)
        os.fsync(fd)
        os.close(fd)
    # the stats pass re-reads the postings (term/df columns)
    pq.read_table(os.path.join(d, "postings.parquet"), columns=["term", "n", "sum_tf"])
    return time.time() - t


def main() -> int:
    args = sys.argv[1:]
    write = "--write" in args
    levels = [int(x) for x in args if x != "--write"] or [2, 8]
    fn = _one_write if write else _one
    if write:
        shutil.rmtree(WRITE_DIR, ignore_errors=True)
    for n in levels:
        with mp.get_context("spawn").Pool(n) as pool:
            t0 = time.time()
            times = pool.map(fn, range(n))
            wall = time.time() - t0
        docs = n * DOCS_PER_PROC
        print(
            f"procs={n} docs_per_sec={docs / wall:.0f} wall={wall:.1f}s "
            f"per_proc={[round(x, 1) for x in times]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
