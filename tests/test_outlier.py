"""Data frame analytics outlier detection: exact kNN distance methods + LOF
vs an independent pure-numpy implementation."""
from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_spark.plans.ml import outlier_detection

PTS = np.array([
    [0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [0.1, 0.1], [0.05, 0.05],
    [5.0, 5.0],                       # far outlier
    [1.0, 1.0], [1.1, 1.0], [1.0, 1.1],
])
# k=2 keeps each 3-point cluster self-contained: with k=3 the (1,1)-cluster
# members reach across to the origin cluster and legitimately out-LOF the
# far point (verified against numpy) — a real LOF artifact, not a bug.
K = 2


def np_knn_lof(pts, k):
    n = len(pts)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    nbrs, kth, avg = {}, np.zeros(n), np.zeros(n)
    for i in range(n):
        order = sorted((d[i, j], j) for j in range(n) if j != i)[:k]
        nbrs[i] = [j for _, j in order]
        kth[i] = order[-1][0]
        avg[i] = np.mean([x for x, _ in order])
    lrd = np.zeros(n)
    for i in range(n):
        lrd[i] = 1.0 / np.mean([max(d[i, j], kth[j]) for j in nbrs[i]])
    lof = np.array([np.mean([lrd[j] for j in nbrs[i]]) / lrd[i] for i in range(n)])
    return kth, avg, lof


def test_outlier_matches_numpy(spark):
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(PTS)],
        "pid long, vec array<double>")
    out = {r["pid"]: r for r in
           outlier_detection(df, "pid", "vec", k=K).collect()}
    kth, avg, lof = np_knn_lof(PTS, K)
    for i in range(len(PTS)):
        assert out[i]["dist_kth_nn"] == pytest.approx(kth[i], rel=1e-12)
        assert out[i]["dist_knn"] == pytest.approx(avg[i], rel=1e-12)
        assert out[i]["lof"] == pytest.approx(lof[i], rel=1e-12)
    # the far point is the clear outlier on every method and the ensemble
    assert max(out.values(), key=lambda r: r["outlier_score"])["pid"] == 5
    assert out[5]["lof"] > 2.0
    # inliers in a tight cluster have LOF ~ 1
    assert out[4]["lof"] == pytest.approx(1.0, abs=0.35)


def test_outlier_clustered_bounds_pairs(spark):
    """With pinned centroids, k-NN stays within the assigned cluster."""
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(PTS)],
        "pid long, vec array<double>")
    cents = [[0.05, 0.05], [1.05, 1.05], [5.0, 5.0]]
    out = {r["pid"]: r for r in
           outlier_detection(df, "pid", "vec", k=2, centroids=cents).collect()}
    assert {out[i]["cluster"] for i in range(5)} == {0}
    # a singleton in its cluster is an artifact of OUR cluster bound (the
    # reference's exact kNN has no clusters and scores every row): it must
    # stay in the output, ranked most-outlier
    assert out[5]["outlier_score"] == max(r["outlier_score"] for r in out.values())
    assert {out[i]["cluster"] for i in (6, 7, 8)} == {1}
    # cluster-local kth distance for a tight-cluster member is small
    assert out[0]["dist_kth_nn"] < 0.2


def test_outlier_singleton_cluster_scored_max(spark):
    """A point alone in its cluster (our cluster-bound artifact — the
    reference's exact kNN scores every row) stays in the output as the
    most outlier-like row instead of silently vanishing."""
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [0.1, 0.0]), (2, [9.0, 9.0])],
        "pid long, vec array<double>")
    out = {r["pid"]: r for r in outlier_detection(
        df, "pid", "vec", k=1, centroids=[[0.0, 0.0], [9.0, 9.0]]).collect()}
    assert sorted(out) == [0, 1, 2]
    assert out[2]["outlier_score"] == max(r["outlier_score"] for r in out.values())
