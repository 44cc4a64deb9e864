"""No-Spark scaling control: N independent OS processes each run the
IDENTICAL per-partition segment build (``build_segment_frames``) on its
own slice of pages — zero coordination, zero shuffle, no JVM. If
throughput stops scaling with N here, the ceiling is the BOX (shared
memory bus / hypervisor steal), not the Spark job structure.

Usage: python tools/bandwidth_control.py [n_procs ...] (default: 2 8)
Prints one line per level: procs, docs/sec, per-proc seconds.
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

sys.path.insert(0, "/root/repo")

DOCS_PER_PROC = 4000


def _one(pid: int) -> float:
    from elasticsearch_spark.operators.postings import build_segment_frames
    from elasticsearch_spark.sources.pages import pages_pdf

    pdf = pages_pdf(DOCS_PER_PROC, start=pid * DOCS_PER_PROC)
    t = time.time()
    build_segment_frames(pdf, pid, "standard")
    return time.time() - t


def main() -> int:
    levels = [int(x) for x in sys.argv[1:]] or [2, 8]
    for n in levels:
        with mp.get_context("spawn").Pool(n) as pool:
            t0 = time.time()
            times = pool.map(_one, range(n))
            wall = time.time() - t0
        docs = n * DOCS_PER_PROC
        print(
            f"procs={n} docs_per_sec={docs / wall:.0f} wall={wall:.1f}s "
            f"per_proc={[round(x, 1) for x in times]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
