"""Merging t-digest (Dunning & Ertl, "Computing extremely accurate
quantiles using t-digests") — the sketch behind the reference's
percentiles aggregation (``server/src/main/java/org/elasticsearch/search/
aggregations/metrics/TDigestState.java``).

Pure-numpy MergingDigest variant with the k1 scale function
``k(q) = (δ / 2π) · asin(2q − 1)``: centroids near the tails stay tiny
(capacity → 0 as q → 0 or 1), so tail quantiles are near-exact while the
middle compresses — the property that distinguishes t-digest from
rank-error sketches like Greenwald-Khanna.

Distributed shape (how aggs.py uses it): one digest per partition built
from locally sorted values (``mapInPandas``), the ≤ ~2δ centroids per
partition shipped to the coordinator, merged by mean-order re-clustering
— the same per-shard-collect → coordinator-reduce contract as the
reference's ``InternalTDigestPercentiles``. Deterministic for a fixed
partitioning (merge order is sorted, not arrival-order)."""

from __future__ import annotations

import math

import numpy as np


def compress(means: np.ndarray, weights: np.ndarray, compression: float = 100.0):
    """Re-cluster (mean-sorted) centroids to the k1 capacity bound.
    Returns (means, weights) of the merged digest."""
    if len(means) == 0:
        return means.astype(np.float64), weights.astype(np.float64)
    order = np.argsort(means, kind="mergesort")
    means = np.asarray(means, dtype=np.float64)[order]
    weights = np.asarray(weights, dtype=np.float64)[order]
    total = float(weights.sum())
    out_m: list[float] = [means[0]]
    out_w: list[float] = [weights[0]]
    w_so_far = 0.0  # weight fully to the left of the open centroid
    norm = compression / (2.0 * math.pi)

    def k(q: float) -> float:
        return norm * math.asin(max(-1.0, min(1.0, 2.0 * q - 1.0)))

    q_left = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q_right = (w_so_far + out_w[-1] + w) / total
        if k(q_right) - k(q_left) <= 1.0:
            # merge into the open centroid (weighted mean)
            nw = out_w[-1] + w
            out_m[-1] += (m - out_m[-1]) * w / nw
            out_w[-1] = nw
        else:
            w_so_far += out_w[-1]
            q_left = w_so_far / total
            out_m.append(m)
            out_w.append(w)
    return np.array(out_m), np.array(out_w)


def from_values(values: np.ndarray, compression: float = 100.0):
    """Build a digest from raw values (one partition's batch).
    Returns (means, weights, min, max) — the observed extremes ride along
    (the reference TDigestState tracks them) so quantile() can interpolate
    the TAILS against real bounds instead of clamping to centroid means."""
    v = np.asarray(values, dtype=np.float64)
    v = v[~np.isnan(v)]
    if len(v) == 0:
        return np.zeros(0), np.zeros(0), float("nan"), float("nan")
    m, w = compress(v, np.ones(len(v)), compression)
    return m, w, float(v.min()), float(v.max())


def merge(digests, compression: float = 100.0):
    """Merge per-partition digests: concatenate centroids, re-cluster;
    extremes propagate as min-of-mins / max-of-maxes."""
    live = [d for d in digests if len(d[0])]
    if not live:
        return np.zeros(0), np.zeros(0), float("nan"), float("nan")
    m, w = compress(
        np.concatenate([d[0] for d in live]),
        np.concatenate([d[1] for d in live]),
        compression,
    )
    return m, w, min(d[2] for d in live), max(d[3] for d in live)


def quantile(
    means: np.ndarray,
    weights: np.ndarray,
    q: float,
    vmin: float | None = None,
    vmax: float | None = None,
) -> float:
    """Estimate the q-quantile (0..1): linear interpolation between
    centroid CENTERS in the interior, and against the true min/max in the
    tails (the reference AbstractTDigest.quantile shape) — the tail fix
    that makes p99.9 behave like a t-digest instead of a centroid clamp."""
    n = len(means)
    if n == 0:
        return float("nan")
    if n == 1:
        return float(means[0])
    total = float(weights.sum())
    idx = q * total
    cum = np.cumsum(weights) - weights / 2.0
    if idx <= cum[0]:
        if vmin is not None and weights[0] > 0:
            frac = idx / max(cum[0], 1e-12)
            return float(vmin + max(frac, 0.0) * (means[0] - vmin))
        return float(means[0])
    if idx >= cum[-1]:
        if vmax is not None and weights[-1] > 0:
            span = total - cum[-1]
            frac = (idx - cum[-1]) / max(span, 1e-12)
            return float(means[-1] + min(frac, 1.0) * (vmax - means[-1]))
        return float(means[-1])
    hi = int(np.searchsorted(cum, idx))
    lo = hi - 1
    frac = (idx - cum[lo]) / (cum[hi] - cum[lo])
    return float(means[lo] + frac * (means[hi] - means[lo]))


def cdf(
    means: np.ndarray,
    weights: np.ndarray,
    x: float,
    vmin: float | None = None,
    vmax: float | None = None,
) -> float:
    """CDF at x (0..1) — the inverse of ``quantile`` with the same
    centroid-center interpolation and min/max tail anchoring (the
    reference's TDigestState.cdf shape, used by percentile_ranks)."""
    n = len(means)
    if n == 0:
        return float("nan")
    total = float(weights.sum())
    if vmin is not None and x < vmin:
        return 0.0
    if vmax is not None and x > vmax:
        return 1.0
    if n == 1:
        if x < means[0]:
            return 0.0
        if x > means[0]:
            return 1.0
        return 0.5
    cum = np.cumsum(weights) - weights / 2.0
    if x <= means[0]:
        if vmin is not None and means[0] > vmin:
            frac = (x - vmin) / (means[0] - vmin)
            return float(max(frac, 0.0) * cum[0] / total)
        return float(cum[0] / total) if x == means[0] else 0.0
    if x >= means[-1]:
        if vmax is not None and vmax > means[-1]:
            span = total - cum[-1]
            frac = (x - means[-1]) / (vmax - means[-1])
            return float((cum[-1] + min(frac, 1.0) * span) / total)
        return 1.0
    hi = int(np.searchsorted(means, x, side="right"))
    hi = min(max(hi, 1), n - 1)
    lo = hi - 1
    if means[hi] == means[lo]:
        return float(cum[hi] / total)
    frac = (x - means[lo]) / (means[hi] - means[lo])
    return float((cum[lo] + frac * (cum[hi] - cum[lo])) / total)
