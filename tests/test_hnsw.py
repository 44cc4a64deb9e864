"""Per-shard HNSW graphs (dense_vector index_options hnsw): in-memory
graph recall, pack/unpack round-trip, end-to-end Spark probe vs brute
force."""

from __future__ import annotations

import numpy as np
import pytest

from elasticsearch_spark.operators.hnsw import (
    _pack_graph,
    _unpack_graph,
    build_graph,
    build_hnsw_index,
    hnsw_topk,
    search_graph,
)


def _vectors(n=600, dim=32, seed=3):
    rng = np.random.Generator(np.random.Philox(key=[seed, 1]))
    V = rng.normal(size=(n, dim)).astype(np.float32)
    return V / np.linalg.norm(V, axis=1, keepdims=True)


def test_graph_recall_vs_brute_force():
    V = _vectors()
    g = build_graph(V, M=12, ef_construction=80)
    rng = np.random.Generator(np.random.Philox(key=[9, 1]))
    recalls = []
    for _ in range(20):
        q = rng.normal(size=V.shape[1]).astype(np.float32)
        q /= np.linalg.norm(q)
        truth = set(np.argsort(-(V @ q))[:10].tolist())
        got = {n for _, n in search_graph(g, q, 10, ef=64)}
        recalls.append(len(got & truth) / 10)
    assert np.mean(recalls) >= 0.9, np.mean(recalls)


def test_pack_unpack_roundtrip():
    V = _vectors(n=80)
    g = build_graph(V, M=8, ef_construction=40)
    keys = np.arange(80, dtype=np.int64) * 7
    g2, keys2 = _unpack_graph(_pack_graph(g, keys))
    assert np.array_equal(keys, keys2)
    assert g2.entry == g.entry and g2.top == g.top
    assert len(g2.layers) == len(g.layers)
    for l1, l2 in zip(g.layers, g2.layers):
        assert {k: list(v) for k, v in l1.items()} == l2
    q = V[3]
    assert search_graph(g, q, 5, 32) == search_graph(g2, q, 5, 32)


def test_hnsw_spark_end_to_end(spark, tmp_path):
    V = _vectors(n=400, dim=16, seed=11)
    rows = [(int(i), [float(x) for x in V[i]]) for i in range(len(V))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = str(tmp_path / "hnsw")
    n_graphs = build_hnsw_index(df, "vec_id", "embedding", path, n_graphs=4, M=8, ef_construction=60)
    assert n_graphs == 4
    q = V[7]
    got = [r["key"] for r in hnsw_topk(spark, path, q, k=10, ef_search=48).collect()]
    assert got[0] == 7  # the vector itself is its own nearest neighbor
    truth = set(np.argsort(-(V @ q))[:10].tolist())
    assert len(set(got) & truth) >= 8  # ≥0.8 recall@10 across 4 shard graphs


def test_engine_knn_search_hnsw_and_fallback(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    V = _vectors(n=60, dim=8, seed=21)
    es = Engine(spark, root=str(tmp_path))
    es.create_index("vecs", num_partitions=2)
    docs = spark.createDataFrame(
        [(f"u{i:03d}", f"doc {i}", "en", [float(x) for x in V[i]]) for i in range(60)],
        "url string, text string, lang string, emb array<float>",
    )
    es.bulk("vecs", docs)
    # fallback (no graphs yet): exact scorer
    exact = es.knn_search("vecs", "emb", V[5], k=5).collect()
    assert len(exact) == 5
    # build graphs → HNSW path; the query vector's own doc is rank 1
    info = es.build_vector_index("vecs", "emb", n_graphs=2, M=8, ef_construction=40)
    assert info["graphs"] == 2
    got = es.knn_search("vecs", "emb", V[5], k=5).collect()
    assert got[0]["url"] == "u005"
    assert abs(got[0]["_score"] - 1.0) < 1e-5


def test_hnsw_string_keys_stamped(spark, tmp_path):
    """The key type is stamped at build time and resolved at probe time —
    a string-keyed index probed with the old default 'long' crashed in the
    executor (or silently int-mangled digit-string keys like '0042')."""
    import numpy as np
    import pytest as _pytest

    from elasticsearch_spark.operators.hnsw import build_hnsw_index, hnsw_topk

    rng = np.random.default_rng(7)
    rows = [(f"{i:04d}", [float(x) for x in rng.normal(size=8)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id string, embedding array<float>")
    path = str(tmp_path / "g_str")
    build_hnsw_index(df, "vec_id", "embedding", path, n_graphs=2)
    out = hnsw_topk(spark, path, rows[0][1], k=5).collect()
    assert out and all(isinstance(r["key"], str) and len(r["key"]) == 4 for r in out)
    assert out[0]["key"] == "0000"  # the query vector itself
    with _pytest.raises(ValueError, match="contradicts"):
        hnsw_topk(spark, path, rows[0][1], k=5, key_type="long")
