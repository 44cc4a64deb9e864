"""Per-shard HNSW ANN graphs (``dense_vector`` ``index_options.type:
hnsw`` — Lucene ``util/hnsw/HnswGraphBuilder.java`` via
``index/mapper/vectors/DenseVectorFieldMapper.java``).

Distribution model = EXACTLY the reference's: each shard builds its own
HNSW graph over its vectors, and a kNN search probes every shard's graph
and merges the per-shard top-k (``TransportKnnSearchAction``). In Spark:
vectors are hash-partitioned into G graph partitions, each partition task
builds one graph in numpy (``applyInPandas``), and a query runs one task
per graph → per-graph top-k → coordinator ``orderBy(score).limit(k)``.
Graph build parallelism and query fan-out both scale with G; per-graph
search is sublinear (greedy descent + beam), so total probe cost is
O(G · ef · log n/G) versus brute force O(n).

Graph construction is the standard HNSW insert: geometric level
assignment (mL = 1/ln M), greedy descent through upper layers, beam
(ef_construction) search at each level ≤ node level, closest-M neighbor
selection with bidirectional links pruned to M_max (2M at layer 0 like
Lucene). Distances: cosine via dot product on build-time-normalized
float32 vectors. Per-candidate neighbor expansion is a vectorized numpy
gather+matvec — no per-dimension Python.

Persistence: one parquet row per graph — keys, normalized vectors, and
the ragged adjacency (flattened int32 + offsets per layer) packed with
``np.savez`` (no pickle) into a binary column. A 100 TB corpus stores
graphs as one row-group per shard; queries read only graph rows
(column-pruned), never the raw corpus.
"""

from __future__ import annotations

import io
import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 0x5EED


# --------------------------------------------------------------------------
# in-memory graph (pure numpy/python; unit-tested directly)
# --------------------------------------------------------------------------


class _Graph:
    """Adjacency per layer: layers[l][node] = list[int]. Vectors are
    L2-normalized float32, distance = 1 − dot."""

    def __init__(self, V: np.ndarray, M: int):
        self.V = V
        self.M = M
        self.layers: list[dict[int, list[int]]] = []
        self.entry = -1
        self.top = -1


def _search_layer(g: _Graph, q: np.ndarray, entry: int, ef: int, layer: int) -> list[tuple[float, int]]:
    """Beam search in one layer → ascending-distance [(dist, node)] (≤ef)."""
    import heapq

    adj = g.layers[layer]
    d0 = float(1.0 - g.V[entry] @ q)
    visited = {entry}
    cand = [(d0, entry)]  # min-heap by distance
    best = [(-d0, entry)]  # max-heap (bounded ef)
    while cand:
        dc, c = heapq.heappop(cand)
        if dc > -best[0][0] and len(best) >= ef:
            break
        nbrs = [x for x in adj.get(c, ()) if x not in visited]
        if not nbrs:
            continue
        visited.update(nbrs)
        ds = 1.0 - g.V[nbrs] @ q  # vectorized batch distance
        for dn, nb in zip(ds, nbrs):
            dn = float(dn)
            if len(best) < ef or dn < -best[0][0]:
                heapq.heappush(cand, (dn, nb))
                heapq.heappush(best, (-dn, nb))
                if len(best) > ef:
                    heapq.heappop(best)
    return sorted((-nd, n) for nd, n in best)


def build_graph(V: np.ndarray, M: int = 16, ef_construction: int = 100, seed: int = SEED) -> _Graph:
    """Standard HNSW construction over normalized vectors."""
    n = len(V)
    g = _Graph(V, M)
    if n == 0:
        return g
    rng = np.random.Generator(np.random.Philox(key=[seed, 101]))
    mL = 1.0 / math.log(M)
    node_levels = np.minimum(
        (-np.log(rng.random(n)) * mL).astype(np.int64), 31
    )
    m_max0 = 2 * M  # layer-0 degree cap (Lucene's maxConn*2 at bottom)
    for node in range(n):
        lvl = int(node_levels[node])
        while len(g.layers) <= lvl:
            g.layers.append({})
        if g.entry < 0:
            for lc in range(lvl + 1):
                g.layers[lc][node] = []
            g.entry, g.top = node, lvl
            continue
        q = V[node]
        ep = g.entry
        for lc in range(g.top, lvl, -1):  # greedy descent above node level
            ep = _search_layer(g, q, ep, 1, lc)[0][1]
        for lc in range(min(lvl, g.top), -1, -1):
            cands = _search_layer(g, q, ep, ef_construction, lc)
            cap = m_max0 if lc == 0 else M
            sel = [c for _, c in cands[:M]]
            g.layers[lc][node] = list(sel)
            for s in sel:  # bidirectional + prune by distance
                lst = g.layers[lc].setdefault(s, [])
                lst.append(node)
                if len(lst) > cap:
                    ds = 1.0 - g.V[lst] @ g.V[s]
                    keep = np.argsort(ds, kind="mergesort")[:cap]
                    g.layers[lc][s] = [lst[i] for i in keep]
            ep = cands[0][1]
        if lvl > g.top:
            for lc in range(g.top + 1, lvl + 1):  # fresh upper layers
                g.layers[lc][node] = []
            g.entry, g.top = node, lvl
    return g


def search_graph(g: _Graph, q: np.ndarray, k: int, ef: int) -> list[tuple[float, int]]:
    """→ ascending-distance [(dist, node)] of length ≤ k."""
    if g.entry < 0:
        return []
    ep = g.entry
    for lc in range(g.top, 0, -1):
        ep = _search_layer(g, q, ep, 1, lc)[0][1]
    return _search_layer(g, q, ep, max(ef, k), 0)[:k]


# --------------------------------------------------------------------------
# (de)serialization: np.savez into one binary cell (no pickle)
# --------------------------------------------------------------------------


def _pack_graph(g: _Graph, keys: np.ndarray) -> bytes:
    arrays = {"keys": keys, "V": g.V, "meta": np.array([g.entry, g.top, g.M], dtype=np.int64)}
    for li, adj in enumerate(g.layers):
        nodes = np.fromiter(adj.keys(), dtype=np.int64, count=len(adj))
        lens = np.fromiter((len(adj[x]) for x in nodes), dtype=np.int64, count=len(adj))
        flat = np.concatenate([np.asarray(adj[x], dtype=np.int32) for x in nodes]) if len(nodes) else np.zeros(0, np.int32)
        arrays[f"l{li}_nodes"] = nodes
        arrays[f"l{li}_lens"] = lens
        arrays[f"l{li}_flat"] = flat
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def _unpack_graph(blob: bytes) -> tuple[_Graph, np.ndarray]:
    z = np.load(io.BytesIO(blob))
    entry, top, M = (int(x) for x in z["meta"])
    g = _Graph(z["V"], M)
    g.entry, g.top = entry, top
    li = 0
    while f"l{li}_nodes" in z:
        nodes, lens, flat = z[f"l{li}_nodes"], z[f"l{li}_lens"], z[f"l{li}_flat"]
        offs = np.r_[0, np.cumsum(lens)]
        g.layers.append(
            {int(n): flat[offs[i]:offs[i + 1]].tolist() for i, n in enumerate(nodes)}
        )
        li += 1
    return g, z["keys"]


# --------------------------------------------------------------------------
# Spark surface
# --------------------------------------------------------------------------


def build_hnsw_index(
    df: DataFrame,
    key: str,
    vec_col: str,
    out_path: str,
    n_graphs: int | None = None,
    M: int = 16,
    ef_construction: int = 100,
) -> int:
    """Hash-partition vectors into ``n_graphs`` shards, build one HNSW
    graph per shard (one task each), write one parquet row per graph."""
    spark = df.sparkSession
    n_graphs = n_graphs or max(2, spark.sparkContext.defaultParallelism // 4)
    key_is_str = dict(df.dtypes)[key] == "string"
    # docs without a vector are simply not in the graph (the reference
    # skips vector-less docs at index time)
    df = df.where(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
    base = df.select(
        F.pmod(F.xxhash64(F.col(key)), F.lit(n_graphs)).cast("int").alias("gid"),
        F.col(key).cast("string" if key_is_str else "long").alias("__key"),
        F.col(vec_col).cast("array<float>").alias("__v"),
    )

    def build_one(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = pdf["__key"].to_numpy()
        if keys.dtype == object:  # string keys → fixed-width unicode (no pickle)
            keys = keys.astype(str)
        order = np.argsort(keys, kind="mergesort")  # deterministic insert order
        keys = keys[order]
        V = np.asarray([np.asarray(v, dtype=np.float32) for v in pdf["__v"].to_numpy()[order]])
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        gid = int(pdf["gid"].iloc[0])
        g = build_graph(V.astype(np.float32), M=M, ef_construction=ef_construction, seed=SEED + gid)
        return pd.DataFrame({"gid": [gid], "n": [len(keys)],
                             "blob": [_pack_graph(g, keys)],
                             "key_type": ["string" if key_is_str else "long"]})

    build_one.__annotations__ = {"pdf": pd.DataFrame, "return": pd.DataFrame}
    (
        base.groupBy("gid")
        .applyInPandas(build_one, "gid int, n long, blob binary, key_type string")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return n_graphs


def hnsw_topk(
    spark: SparkSession,
    index_path: str,
    query_vec,
    k: int = 10,
    ef_search: int = 64,
    key_type: str | None = None,
) -> DataFrame:
    """Probe every shard graph (one task per graph row), merge per-shard
    top-k by cosine — the reference's per-shard kNN + coordinator merge.

    key_type defaults to the type STAMPED on the index at build time
    (same contract as the LSH index parameters); passing a contradicting
    value raises instead of crashing in the executor or silently mangling
    digit-string keys. Legacy unstamped indexes fall back to "long"."""
    graphs_probe = spark.read.parquet(index_path)
    stored = None
    if "key_type" in graphs_probe.columns:
        row = graphs_probe.select("key_type").first()
        stored = row[0] if row else None
    if key_type is not None and stored is not None and key_type != stored:
        raise ValueError(
            f"hnsw_topk key_type={key_type!r} contradicts the index's build "
            f"type {stored!r}")
    key_type = key_type or stored or "long"
    q = np.asarray(query_vec, dtype=np.float32)
    q = q / max(float(np.linalg.norm(q)), 1e-12)
    cast = int if key_type == "long" else str

    def probe(batches):
        for pdf in batches:
            outs = []
            for blob in pdf["blob"]:
                g, keys = _unpack_graph(bytes(blob))
                hits = search_graph(g, q.astype(g.V.dtype), k, ef_search)
                if hits:
                    outs.append(pd.DataFrame({
                        "key": [cast(keys[n]) for _, n in hits],
                        "cosine": [1.0 - d for d, _ in hits],
                    }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    graphs = graphs_probe.select("blob")
    return (
        graphs.mapInPandas(probe, f"key {key_type}, cosine double")
        .orderBy(F.desc("cosine"), F.asc("key"))
        .limit(k)
    )
