"""ANN similarity search: brute-force exactness + LSH recall vs baseline."""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_spark.operators import similarity

N, DIM = 400, 32


@pytest.fixture(scope="module")
def vec_df(spark):
    rng = np.random.Generator(np.random.Philox(key=[5, 6]))
    # clustered vectors so near neighbors genuinely exist
    centers = rng.normal(size=(8, DIM)) * 3
    rows = []
    for i in range(N):
        c = centers[i % 8]
        rows.append((i, [float(x) for x in c + rng.normal(size=DIM)]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


@pytest.fixture(scope="module")
def qvec():
    rng = np.random.Generator(np.random.Philox(key=[5, 6]))
    centers = rng.normal(size=(8, DIM)) * 3
    return centers[3] + 0.1


def test_brute_force_matches_numpy(spark, vec_df, qvec):
    got = similarity.brute_force_topk(vec_df, "vec_id", "embedding", qvec, k=10).collect()
    pdf = vec_df.toPandas()
    m = np.stack(pdf["embedding"].to_numpy())
    cos = (m @ qvec) / (np.linalg.norm(m, axis=1) * np.linalg.norm(qvec))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -cos))[:10]
    exp = list(pdf["vec_id"].to_numpy()[order])
    assert [r["vec_id"] for r in got] == exp
    np.testing.assert_allclose([r["cosine"] for r in got], sorted(cos, reverse=True)[:10], rtol=1e-9)


def test_lsh_recall_at_10(spark, vec_df, qvec):
    idx = similarity.build_lsh_index(vec_df, "vec_id", "embedding", n_tables=8, n_planes=10).cache()
    exact = {r["vec_id"] for r in similarity.brute_force_topk(vec_df, "vec_id", "embedding", qvec, k=10).collect()}
    ann = {r["__key"] for r in similarity.lsh_topk(idx, qvec, k=10, n_tables=8, n_planes=10).collect()}
    recall = len(exact & ann) / 10
    assert recall >= 0.7, recall


def test_lsh_candidates_bounded(spark, vec_df, qvec):
    """The probe must touch a small fraction of the corpus (it's ANN, not a
    scan): candidate set << N."""
    idx = similarity.build_lsh_index(vec_df, "vec_id", "embedding", n_tables=4, n_planes=12).cache()
    from pyspark.sql import functions as F

    planes = similarity._planes(4, 12, DIM)
    probes = []
    qv = np.asarray(qvec)
    for t in range(4):
        dots = planes[t] @ qv
        sig = sum((1 << i) for i, d in enumerate(dots) if d >= 0)
        probes.append((t, sig))
    probe_df = idx.sparkSession.createDataFrame(probes, "tbl int, bucket long")
    n_cand = idx.join(F.broadcast(probe_df), ["tbl", "bucket"]).dropDuplicates(["__key"]).count()
    assert n_cand < N // 2


def test_ivf_recall_and_partition_prune(spark):
    """IVF-Flat ANN: recall@10 vs the exact baseline, probe bounded by
    nprobe lists."""
    import numpy as np

    from elasticsearch_spark.operators.similarity import (
        brute_force_topk,
        build_ivf_index,
        ivf_topk,
        train_centroids,
    )

    rng = np.random.Generator(np.random.Philox(3))
    vecs = rng.normal(size=(400, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(400)],
        "vid long, emb array<double>",
    )
    qv = [float(x) for x in vecs[0]]
    idx, cents = build_ivf_index(df, "vid", "emb", n_lists=16)
    assert cents.shape == (16, 16)
    exact = [r["vid"] for r in brute_force_topk(df, "vid", "emb", qv, k=10).collect()]
    got = [r["__key"] for r in ivf_topk(idx, cents, qv, k=10, nprobe=6).collect()]
    recall = len(set(exact) & set(got)) / 10
    assert recall >= 0.6, recall
    assert got[0] == 0  # the query vector itself is always found
    # candidate set is bounded by the probed lists, not the corpus
    n_cands = idx.where("list_id in (0,1)").count()
    assert 0 < n_cands < 400
    # deterministic training
    c2 = train_centroids(vecs[:100], 8)
    c3 = train_centroids(vecs[:100], 8)
    assert np.allclose(c2, c3)


def test_semdedup_drops_near_duplicates(spark):
    # Two orthogonal centroids; cluster 0 holds three near-identical
    # vectors (cos > 0.95 pairwise) + one distinct; cluster 1 holds one.
    c0, c1 = [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]
    rows = [
        (10, [1.0, 0.01, 0.0]),     # cluster 0, most central
        (11, [1.0, 0.02, 0.0]),     # near-dup of 10 -> dropped
        (12, [1.0, 0.015, 0.01]),   # near-dup of 10 -> dropped
        (13, [0.6, 0.0, 0.8]),      # cluster 0 but far from 10 -> kept
        (20, [0.1, 1.0, 0.0]),      # cluster 1, alone -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r.asDict()
        for r in similarity.semdedup(df, "vec_id", "embedding", [c0, c1], eps=0.05).collect()
    }
    assert {k: v["cluster"] for k, v in out.items()} == {
        10: 0, 11: 0, 12: 0, 13: 0, 20: 1}
    assert out[10]["kept"] == 1 and out[10]["max_prev_sim"] == -1.0
    assert out[11]["kept"] == 0 and out[11]["max_prev_sim"] > 0.95
    assert out[12]["kept"] == 0
    assert out[13]["kept"] == 1 and out[20]["kept"] == 1
    # upper-triangular semantics: 12 compares against BOTH 10 and 11
    # (11 itself dropped) — max_prev_sim is the max over earlier ranks
    import numpy as np
    v11, v12 = np.array(rows[1][1]), np.array(rows[2][1])
    cos = float(v11 @ v12 / (np.linalg.norm(v11) * np.linalg.norm(v12)))
    v10 = np.array(rows[0][1])
    cos10 = float(v10 @ v12 / (np.linalg.norm(v10) * np.linalg.norm(v12)))
    assert abs(out[12]["max_prev_sim"] - max(cos, cos10)) < 1e-7


def test_bbq_topk_recall_and_packing(spark, vec_df, qvec):
    means = similarity.dim_means(vec_df, "embedding")
    exact = [r["vec_id"] for r in
             similarity.brute_force_topk(vec_df, "vec_id", "embedding", qvec, k=10).collect()]
    got = similarity.bbq_topk(
        vec_df, "vec_id", "embedding", qvec, means, k=10, rerank_factor=5
    ).collect()
    ids = [r["vec_id"] for r in got]
    # oversampled hamming scan + exact rerank: high overlap with exact top-10
    assert len(set(ids) & set(exact)) >= 7
    # cosine column is the exact score (re-rank), descending
    coss = [r["cosine"] for r in got]
    assert coss == sorted(coss, reverse=True)


def test_quantize_binary_bit63_and_multiword(spark):
    # dim=70 -> 2 words; vector with every component above the mean sets
    # bits 0..63 of word0 (incl. the sign bit) and 0..5 of word1
    dim = 70
    rows = [(1, [1.0] * dim), (2, [-1.0] * dim)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r["bits"] for r in
           similarity.quantize_binary(df, "embedding", [0.0] * dim).collect()}
    assert out[1] == [-1, 63]          # all-64 bits set = -1 signed; 6 bits = 63
    assert out[2] == [0, 0]
    # hamming between them = 70 -> bbq ranks vec 1 first for an all-positive query
    got = similarity.bbq_topk(df, "vec_id", "embedding", [1.0] * dim,
                              [0.0] * dim, k=2, rerank_factor=2).collect()
    assert [r["vec_id"] for r in got] == [1, 2]
    assert got[0]["hamming"] == 0 and got[1]["hamming"] == 70


def test_quantize_int4_coarser_than_int8(spark, vec_df):
    e8 = {r["vec_id"]: r["recon_err"] for r in
          similarity.quantize_int8(vec_df, "vec_id", "embedding").collect()}
    e4 = {r["vec_id"]: r["recon_err"] for r in
          similarity.quantize_int4(vec_df, "vec_id", "embedding").collect()}
    import statistics
    assert statistics.mean(e4.values()) > statistics.mean(e8.values())
    # int4 levels bounded to [0, 15]
    q = similarity.quantize_int4(vec_df, "vec_id", "embedding").first()["qvec"]
    assert all(0 <= v <= 15 for v in q)


def test_maxsim_exact_math(spark):
    # doc 1: one vector aligned with q0, another with q1 -> score = 2.0
    # doc 2: both vectors aligned only with q0 -> max picks it twice for
    #        q0 (1.0) but q1 finds nothing (0.0 best) -> score = 1.0
    docs = [
        (1, [[1.0, 0.0], [0.0, 1.0]]),
        (2, [[1.0, 0.0], [1.0, 0.0]]),
        (3, [[-1.0, 0.0], [0.0, -1.0]]),
    ]
    df = spark.createDataFrame(docs, "vec_id long, mv array<array<double>>")
    qs = [[1.0, 0.0], [0.0, 1.0]]
    out = {r["vec_id"]: r["score"] for r in
           similarity.maxsim_topk(df, "vec_id", "mv", qs, k=3).collect()}
    assert out[1] == 2.0
    assert out[2] == 1.0
    assert out[3] == 0.0  # max picks the least-bad dot (0) per query vector


def test_lsh_params_stamped_and_mismatch_raises(spark, vec_df, qvec, tmp_path):
    """build_lsh_index stamps (n_tables, n_planes, seed) on the index;
    lsh_topk defaults to the stamp — including through a parquet round-trip
    — and an explicitly contradicting value raises instead of silently
    probing buckets the index never populated."""
    import pytest as _pytest

    idx = similarity.build_lsh_index(vec_df, "vec_id", "embedding", n_tables=4, n_planes=9)
    p = str(tmp_path / "lshidx")
    idx.write.parquet(p)
    loaded = spark.read.parquet(p)
    exact = {r["vec_id"] for r in similarity.brute_force_topk(
        vec_df, "vec_id", "embedding", qvec, k=10).collect()}
    ann = {r["__key"] for r in similarity.lsh_topk(loaded, qvec, k=10).collect()}
    assert len(exact & ann) / 10 >= 0.5  # defaults resolved from the stamp
    with _pytest.raises(ValueError, match="contradicts"):
        similarity.lsh_topk(loaded, qvec, k=10, n_planes=14)
