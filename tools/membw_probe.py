"""Memory-bandwidth spot check — the bench hygiene gate.

This VM shares a host; noisy neighbors show up as memory-bandwidth collapse
(CPU and disk probes stay normal, PSI stays zero, but streaming numpy ops
run 10-100x slow, and every Spark stage that decodes/encodes postings
inherits it). Run this BEFORE recording any bench number:

    python tools/membw_probe.py

Healthy box: < ~2 s. Degraded: tens of seconds — re-run the bench later and
treat the slow measurement as a load artifact (see BENCH/BASELINE.md,
"Measurement hygiene").
"""

from __future__ import annotations

import time

import numpy as np


def probe(mb: int = 200, rounds: int = 5) -> float:
    a = np.zeros(mb * 1_000_000 // 8)
    t0 = time.time()
    for _ in range(rounds):
        a = a + 1.0
    return time.time() - t0


if __name__ == "__main__":
    t = probe()
    status = "HEALTHY" if t < 2.0 else "DEGRADED"
    print(f"membw probe: {t:.2f} s ({status}; healthy < ~2s)")
