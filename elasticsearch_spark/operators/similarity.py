"""Approximate-nearest-neighbor search over embedding columns.

Two physical strategies with identical semantics (ANN recall measured
against the exact baseline in tests):

- **brute force** (the exact baseline): cosine against every row with a
  broadcast query vector — one narrow scan, `TakeOrderedAndProject` top-k;
  correct at any scale, cost O(corpus).
- **LSH-bucketed**: random-hyperplane signatures (L tables × P planes,
  deterministic seed) materialized once as an index table; a query probes
  its L buckets (+ optional multi-probe neighbors at hamming distance 1)
  and re-ranks only the candidates exactly. At 10^12 rows the probe is a
  partition-pruned lookup: the index table is written partitioned by
  (table, bucket).

All vector math is JVM-side (`zip_with`/`aggregate` higher-order
functions) — no Python in the scan path; only the plane signatures use a
seeded numpy constant folded into the plan as literals.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED = 42


def _cos_cols(vec_col: str, qcol: str) -> F.Column:
    dot = f"aggregate(zip_with({vec_col}, {qcol}, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    na = f"sqrt(aggregate({vec_col}, 0D, (acc, x) -> acc + x * x))"
    nb = f"sqrt(aggregate({qcol}, 0D, (acc, x) -> acc + x * x))"
    return F.expr(f"({dot}) / ({na} * {nb})")


def brute_force_topk(df: DataFrame, key: str, vec_col: str, query_vec, k: int = 10) -> DataFrame:
    """Exact cosine top-k: broadcast the query vector as a literal array,
    score every row, deterministic tie-break (cosine DESC, key ASC)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(key), F.col(vec_col).cast("array<double>").alias("__v"))
        .withColumn("__q", q)
        .withColumn("cosine", _cos_cols("__v", "__q"))
        .select(key, "cosine")
        .orderBy(F.desc("cosine"), F.asc(key))
        .limit(k)
    )


def _planes(n_tables: int, n_planes: int, dim: int, seed: int = SEED) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=[seed, 13]))
    return rng.normal(size=(n_tables, n_planes, dim))


def pick_n_planes(n_rows: int, target_bucket: int = 32) -> int:
    """Bucket-size-targeted plane count: 2^planes buckets ≈ N/target (so a
    probe scans ~target_bucket candidates per table regardless of N — the
    knob that keeps query cost flat as the corpus scales to 10^12)."""
    import math

    return max(4, int(math.log2(max(n_rows / target_bucket, 2))))


def build_lsh_index(
    df: DataFrame,
    key: str,
    vec_col: str,
    n_tables: int = 8,
    n_planes: int | None = None,
    dim: int | None = None,
    seed: int = SEED,
) -> DataFrame:
    """Materialize the LSH index frame: (tbl, bucket, key, vec); bucket =
    the sign pattern of the vector against one table's planes packed into a
    long (bit i = sign of plane_i · v). Write it `partitionBy("tbl",
    "bucket")` for partition-pruned probes at scale."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    if n_planes is None:
        n_planes = pick_n_planes(df.count())
    planes = _planes(n_tables, n_planes, dim, seed)
    # One scan, one Arrow batch per partition: signatures for ALL L tables
    # come from a single numpy matmul sign(V @ P^T) with the bit-pack done
    # in uint64 — (rows x L*P flops) vectorized, vs the old shape of L
    # unioned selects each evaluating P interpreted higher-order-function
    # dot products per row (which also cost seconds of driver plan-build).
    pmat = planes.reshape(n_tables * n_planes, dim).T.copy()  # (dim, L*P)
    weights = (1 << np.arange(n_planes, dtype=np.uint64))

    import pandas as pd

    def _buckets_fn(vs):
        V = np.asarray(list(vs), dtype=np.float64)  # (n, dim)
        signs = (V @ pmat) >= 0  # (n, L*P)
        b = (
            signs.reshape(len(vs), n_tables, n_planes).astype(np.uint64) * weights
        ).sum(axis=2).astype(np.int64)  # (n, L)
        return pd.Series(list(b))

    # annotate explicitly: `from __future__ import annotations` stringifies
    # inline hints, which pandas_udf's eval-type inference can't read
    _buckets_fn.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    _buckets = F.pandas_udf(_buckets_fn, "array<long>")

    base = df.select(F.col(key).alias("__key"), F.col(vec_col).cast("array<double>").alias("__v"))
    # stamp the build parameters into column metadata (on a DATA column —
    # tbl/bucket are partition columns when the index is written
    # partitionBy, and partition-column metadata doesn't survive parquet):
    # lsh_topk reads them back so a probe can never silently hash with
    # different planes than the index
    build_meta = {"lsh_n_tables": n_tables, "lsh_n_planes": n_planes,
                  "lsh_seed": seed, "lsh_dim": dim}
    return (
        base.select(F.posexplode(_buckets("__v")).alias("tbl", "bucket"), "__key", "__v")
        .select("tbl", "bucket", F.col("__key").alias("__key", metadata=build_meta), "__v")
    )


def lsh_topk(
    index_df: DataFrame,
    query_vec,
    k: int = 10,
    n_tables: int | None = None,
    n_planes: int | None = None,
    seed: int | None = None,
    multiprobe: bool = True,
) -> DataFrame:
    """ANN top-k: probe the query's bucket in each table (plus hamming-1
    neighbor buckets when `multiprobe`), exact-rerank candidates.

    n_tables/n_planes/seed default to the values stamped on the index by
    ``build_lsh_index`` (column metadata on ``__key``); passing a value
    that CONTRADICTS the stamp raises — mismatched planes would hash the
    query into buckets the index never populated and recall would silently
    collapse to ~zero. Legacy unstamped indexes fall back to (8, 14, SEED)."""
    md: dict = {}
    for fld in index_df.schema.fields:
        if fld.name == "__key" and fld.metadata:
            md = fld.metadata
    for name, given in (("lsh_n_tables", n_tables), ("lsh_n_planes", n_planes),
                        ("lsh_seed", seed)):
        if given is not None and name in md and int(md[name]) != int(given):
            raise ValueError(
                f"lsh_topk {name}={given} contradicts the index's build "
                f"value {md[name]} — the probe would hash with different "
                "planes than the index")
    n_tables = int(md.get("lsh_n_tables", 8)) if n_tables is None else n_tables
    n_planes = int(md.get("lsh_n_planes", 14)) if n_planes is None else n_planes
    seed = int(md.get("lsh_seed", SEED)) if seed is None else seed
    qv = np.asarray(query_vec, dtype=np.float64)
    planes = _planes(n_tables, n_planes, len(qv), seed)
    probes = []
    for t in range(n_tables):
        dots = planes[t] @ qv
        sig = sum((1 << i) for i, d in enumerate(dots) if d >= 0)
        probes.append((t, sig))
        if multiprobe:
            # flip the least-confident planes (smallest |dot|): 3 neighbors
            order = np.argsort(np.abs(dots))[:3]
            for i in order:
                probes.append((t, sig ^ (1 << int(i))))
    probe_df = index_df.sparkSession.createDataFrame(probes, "tbl int, bucket long")
    cands = index_df.join(F.broadcast(probe_df), ["tbl", "bucket"]).dropDuplicates(["__key"])
    q = F.array(*[F.lit(float(x)) for x in qv])
    return (
        cands.withColumn("__q", q)
        .withColumn("cosine", _cos_cols("__v", "__q"))
        .select(F.col("__key"), "cosine")
        .orderBy(F.desc("cosine"), F.asc("__key"))
        .limit(k)
    )


# --------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + nprobe search — the
# second scale path beside hyperplane LSH (FAISS IVF-Flat shape, public
# algorithm). Centroids train on a bounded driver-side sample; assignment
# and rerank are Arrow-batched matmuls; the index is written
# partitionBy("list_id") so a probe reads only nprobe partitions.
# --------------------------------------------------------------------------

def train_centroids(
    sample: np.ndarray, n_lists: int, iters: int = 10, seed: int = SEED
) -> np.ndarray:
    """Deterministic Lloyd k-means on a sample (numpy; k-means++-lite
    seeding from a seeded permutation). Sample is bounded (≤ ~10k rows) so
    training cost is independent of corpus size."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 29]))
    idx = rng.permutation(len(sample))[:n_lists]
    sample = np.asarray(sample, dtype=np.float64)
    cents = sample[np.sort(idx)].copy()
    s_sq = (sample ** 2).sum(axis=1)  # constant per row; argmin-invariant
    for _ in range(iters):
        # argmin over |s-c|^2 = |c|^2 - 2 s·c (+|s|^2): one matmul,
        # O(sample × n_lists) memory — never the (sample × k × dim) cube
        d = (cents ** 2).sum(axis=1)[None, :] - 2.0 * (sample @ cents.T)
        assign = d.argmin(axis=1)
        for c in range(n_lists):
            m = assign == c
            if m.any():
                cents[c] = sample[m].mean(axis=0)
    return cents


def build_ivf_index(
    df: DataFrame,
    key: str,
    vec_col: str,
    n_lists: int | None = None,
    sample_size: int = 10_000,
    seed: int = SEED,
):
    """Returns (index_df, centroids): index_df = (list_id, key, vec) with
    every vector assigned to its nearest centroid. At 10^12 rows: train on
    the bounded sample, assign in one Arrow-matmul scan, write the index
    ``partitionBy("list_id")`` — a probe then scans nprobe/n_lists of the
    data (partition pruning), the IVF contract."""
    import pandas as pd

    n = df.count()
    if n_lists is None:
        n_lists = max(4, int(math.isqrt(n)))
    frac = min(1.0, sample_size / max(n, 1))
    sample_rows = (
        df.sample(fraction=frac, seed=seed).limit(sample_size).select(vec_col).collect()
    )
    sample = np.array([r[0] for r in sample_rows], dtype=np.float64)
    cents = train_centroids(sample, n_lists, seed=seed)
    cT = cents.T.copy()
    c_sq = (cents ** 2).sum(axis=1)

    def _assign_fn(vs):
        V = np.asarray(list(vs), dtype=np.float64)
        # nearest centroid by L2: argmin(|c|^2 - 2 c·v) (|v|^2 constant per row)
        d = c_sq[None, :] - 2.0 * (V @ cT)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    _assign_fn.__annotations__ = {"vs": pd.Series, "return": pd.Series}
    assign_udf = F.pandas_udf(_assign_fn, "int")
    base = df.select(F.col(key).alias("__key"), F.col(vec_col).cast("array<double>").alias("__v"))
    return base.select(assign_udf("__v").alias("list_id"), "__key", "__v"), cents


def ivf_topk(
    index_df: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the nprobe nearest lists, exact cosine rerank inside them."""
    qv = np.asarray(query_vec, dtype=np.float64)
    d = ((centroids - qv[None, :]) ** 2).sum(axis=1)
    probes = [int(x) for x in np.argsort(d, kind="mergesort")[:nprobe]]
    cands = index_df.where(F.col("list_id").isin(probes))
    q = F.array(*[F.lit(float(x)) for x in qv])
    return (
        cands.withColumn("__q", q)
        .withColumn("cosine", _cos_cols("__v", "__q"))
        .select(F.col("__key"), "cosine")
        .orderBy(F.desc("cosine"), F.asc("__key"))
        .limit(k)
    )


def quantize_int8(
    df: DataFrame,
    key: str,
    vec_col: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
) -> DataFrame:
    """Scalar int8 quantization of an embedding column (the reference's
    dense_vector ``index_options.type: int8_flat / int8_hnsw``; Lucene's
    ``ScalarQuantizer`` — global confidence-interval bounds, components
    mapped to the unsigned 7-bit range [0, 127]).

    Two stages, both scale-safe:
    1. global bounds = (lower_q, upper_q) quantiles over the component
       distribution — ONE aggregate over the exploded components (the
       reference samples vectors for the same estimate; at 10^12 rows
       swap in a deterministic hash-sample of rows before the explode);
    2. per-row map: q = clamp(floor((x - lo) / (hi - lo) * 127 + 0.5)),
       pure JVM ``transform`` — no shuffle, no Python.

    Returns (key, qvec array<int>, recon_err): recon_err is the L2 error
    of the dequantized vector (lo + q * (hi - lo) / 127) vs the original
    — the quantization-loss metric used to validate the sketch.
    """
    return _quantize_scalar(df, key, vec_col, 127, lower_q, upper_q)


def quantize_int4(
    df: DataFrame,
    key: str,
    vec_col: str,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
) -> DataFrame:
    """4-bit scalar quantization (dense_vector ``index_options.type:
    int4_flat / int4_hnsw``) — identical pipeline to ``quantize_int8``
    with the 15-level range [0, 15]; ~2× the reconstruction error for
    half the bytes (the reference's documented trade)."""
    return _quantize_scalar(df, key, vec_col, 15, lower_q, upper_q)


def _quantize_scalar(
    df: DataFrame,
    key: str,
    vec_col: str,
    levels: int,
    lower_q: float,
    upper_q: float,
) -> DataFrame:
    comps = df.select(F.explode(F.col(vec_col).cast("array<double>")).alias("c"))
    lo, hi = comps.agg(
        F.expr(f"percentile(c, {lower_q})"), F.expr(f"percentile(c, {upper_q})")
    ).first()
    lo, hi = float(lo), float(hi)
    scale = (hi - lo) or 1.0
    qexpr = (
        f"transform(cast({vec_col} as array<double>),"
        f" x -> cast(least({levels}, greatest(0, floor((x - {lo!r}) / {scale!r} * {levels} + 0.5d))) as int))"
    )
    dq = (
        f"transform(__qv, q -> {lo!r} + cast(q as double) * {scale!r} / {levels})"
    )
    err = (
        f"sqrt(aggregate(zip_with(cast({vec_col} as array<double>), {dq},"
        f" (x, y) -> (x - y) * (x - y)), 0D, (acc, e) -> acc + e))"
    )
    return (
        df.select(F.col(key), F.col(vec_col), F.expr(qexpr).alias("__qv"))
        .select(
            F.col(key),
            F.col("__qv").alias("qvec"),
            F.round(F.expr(err), 6).alias("recon_err"),
        )
    )


def semdedup(
    df: DataFrame,
    key: str,
    vec_col: str,
    centroids,
    eps: float = 0.05,
) -> DataFrame:
    """SemDeDup semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): assign every vector to its max-cosine centroid,
    rank cluster members most-central-first (descending cosine to the
    centroid, key ascending as the tie-break), and drop any member whose
    cosine to an EARLIER-ranked cluster-mate exceeds ``1 - eps``. This is
    the reference implementation's upper-triangular-max formulation (each
    point compares against ALL earlier points, kept or not), which makes
    the result order-deterministic and join-expressible — no sequential
    greedy scan.

    ``centroids``: k×dim list/array. Train them with ``train_centroids``
    on a bounded deterministic sample in production; they are passed in
    explicitly so a run is reproducible and the k-vector table rides the
    plan as a literal (broadcast-by-construction).

    Plan shape at 10^12 rows: centroid assignment is a JVM ``transform``
    over the literal centroid array — no UDF, no shuffle, O(k·dim) per
    row; the only shuffles key on the cluster id (the rank window and the
    intra-cluster self-join). Pairwise work is O(c²) per cluster with c
    kept bounded by scaling k ~ N / target_cluster_size, exactly the
    paper's recipe (they use k=50k for LAION-440M).

    Returns (key, cluster, cos_centroid, max_prev_sim, kept) — one row
    per input vector; ``max_prev_sim`` is -1.0 for the cluster's
    top-ranked member.
    """

    def dot(a: str, b: str) -> str:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> x * y),"
            f" cast(0 as double), (s, x) -> s + x)"
        )

    cents = [list(map(float, c)) for c in centroids]
    cent_lit = F.array(*[F.array(*[F.lit(v) for v in c]) for c in cents])
    base = (
        df.select(F.col(key).alias(key), F.col(vec_col).cast("array<double>").alias("__v"))
        .withColumn("__cents", cent_lit)
        .withColumn("__norm", F.expr(f"sqrt({dot('__v', '__v')})"))
        .withColumn(
            "__best",
            F.expr(
                "array_min(transform(__cents, (c, i) -> named_struct("
                f"'negcos', -({dot('__v', 'c')}) / (__norm * sqrt({dot('c', 'c')})),"
                " 'cid', i)))"
            ),
        )
        .select(
            key,
            "__v",
            "__norm",
            F.col("__best.cid").alias("cluster"),
            (-F.col("__best.negcos")).alias("cos_centroid"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(
        F.desc("cos_centroid"), F.asc(key)
    )
    ranked = base.withColumn("__rn", F.row_number().over(w))
    a = ranked.select(
        F.col(key).alias("__ka"), F.col("cluster").alias("__ca"),
        F.col("__rn").alias("__ra"), F.col("__v").alias("__va"),
        F.col("__norm").alias("__na"),
    )
    b = ranked.select(
        F.col("cluster").alias("__cb"), F.col("__rn").alias("__rb"),
        F.col("__v").alias("__vb"), F.col("__norm").alias("__nb"),
    )
    prev = (
        a.join(b, (F.col("__ca") == F.col("__cb")) & (F.col("__rb") < F.col("__ra")))
        .withColumn("__cos", F.expr(dot("__va", "__vb")) / (F.col("__na") * F.col("__nb")))
        .groupBy("__ka")
        .agg(F.max("__cos").alias("max_prev_sim"))
    )
    return (
        ranked.join(prev, ranked[key] == prev["__ka"], "left")
        .withColumn("max_prev_sim", F.coalesce("max_prev_sim", F.lit(-1.0)))
        .withColumn(
            "kept", (F.col("max_prev_sim") <= F.lit(1.0 - eps)).cast("int")
        )
        .select(key, "cluster", "cos_centroid", "max_prev_sim", "kept")
    )


def dim_means(df: DataFrame, vec_col: str) -> list[float]:
    """Per-dimension corpus mean — the centering vector for binary
    quantization. One posexplode + groupBy(dim); returns dim scalars
    (model constants, independent of corpus size)."""
    rows = (
        df.select(
            F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x")
        )
        .groupBy("d")
        .agg(F.avg("x").alias("m"))
        .orderBy("d")
        .collect()
    )
    return [float(r["m"]) for r in rows]


def quantize_binary(df: DataFrame, vec_col: str, means) -> DataFrame:
    """1-bit binary quantization (the reference's dense_vector
    ``index_options.type: bbq_flat / bbq_hnsw`` lineage — Lucene's
    binary-quantized codes, in the simplified center-and-sign form):
    bit d = (x_d > mean_d), packed 64 dims per long (``bits``
    array<long>, ceil(dim/64) words). Pure JVM expressions — a literal
    means array, one ``filter``+``aggregate`` per row, no UDF, no
    shuffle. 32× smaller than float32; score with hamming + re-rank
    (``bbq_topk``)."""
    dim = len(means)
    nw = (dim + 63) // 64
    means_lit = F.array(*[F.lit(float(m)) for m in means])
    on = (
        f"filter(sequence(0, {dim - 1}),"
        f" i -> cast({vec_col}[i] as double) > __bq_m[i])"
    )
    words = (
        f"transform(sequence(0, {nw - 1}), w -> aggregate("
        f"filter(__bq_on, i -> i div 64 = w), cast(0 as bigint),"
        f" (acc, i) -> acc | shiftleft(cast(1 as bigint), i % 64)))"
    )
    return (
        df.withColumn("__bq_m", means_lit)
        .withColumn("__bq_on", F.expr(on))
        .withColumn("bits", F.expr(words))
        .drop("__bq_m", "__bq_on")
    )


def bbq_topk(
    df: DataFrame,
    key: str,
    vec_col: str,
    query_vec,
    means,
    k: int = 10,
    rerank_factor: int = 3,
) -> DataFrame:
    """bbq_flat-style search: hamming scan over the packed 1-bit codes
    (cheap, whole-stage-codegen ``bit_count(xor)``), keep the top
    ``k * rerank_factor`` candidates (hamming asc, key asc —
    deterministic), then exact-cosine re-rank of only the candidates and
    return the top k. This is the reference's documented BBQ pipeline
    shape (quantized scan → oversampled candidates → float re-scoring);
    the corrective-term dot-product estimator is simplified to plain
    hamming since the re-rank restores exact scores.

    Scale: the scan is a TakeOrderedAndProject over the bits column (8
    bytes per 64 dims per row — the whole point at 10^12 vectors); only
    k·rerank_factor rows ever touch float math again."""
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    m = np.asarray(list(means), dtype=np.float64)
    on = np.flatnonzero(q > m)
    nw = (len(m) + 63) // 64
    qwords = [0] * nw
    for i in on:
        qwords[i // 64] |= 1 << (i % 64)
    # numpy packs into Python ints; fold to signed 64-bit for the literal
    qwords = [w - (1 << 64) if w >= (1 << 63) else w for w in qwords]
    qb = F.array(*[F.lit(int(w)).cast("long") for w in qwords])
    ham = (
        "aggregate(zip_with(bits, __qb, (a, b) -> cast(bit_count(a ^ b) as"
        " bigint)), cast(0 as bigint), (acc, x) -> acc + x)"
    )
    cands = (
        quantize_binary(df, vec_col, means)
        .withColumn("__qb", qb)
        .withColumn("hamming", F.expr(ham))
        .orderBy(F.asc("hamming"), F.asc(key))
        .limit(int(k) * int(rerank_factor))
    )
    qlit = F.array(*[F.lit(float(x)) for x in q])
    dot = "aggregate(zip_with(__v, __q, (x, y) -> x * y), 0D, (s, x) -> s + x)"
    nrm = (
        "sqrt(aggregate(__v, 0D, (s, x) -> s + x * x))"
        " * sqrt(aggregate(__q, 0D, (s, x) -> s + x * x))"
    )
    return (
        cands.withColumn("__v", F.col(vec_col).cast("array<double>"))
        .withColumn("__q", qlit)
        .withColumn("cosine", F.expr(f"({dot}) / ({nrm})"))
        .orderBy(F.desc("cosine"), F.asc(key))
        .limit(int(k))
        .select(key, "hamming", "cosine")
    )


def maxsim_topk(
    df: DataFrame, key: str, vecs_col: str, query_vecs, k: int = 10
) -> DataFrame:
    """ColBERT-style late-interaction scoring (Khattab & Zaharia, SIGIR
    2020; the multi-vector ``maxSimDotProduct`` ranking adopted by modern
    retrieval engines): documents carry a BAG of vectors (one per token /
    chunk), the query carries another, and score(q, d) = Σ_i max_j
    (q_i · d_j) — each query vector matches its best document vector.

    Pure JVM column math: the query vectors ride the plan as a literal
    array-of-arrays, the per-row score is a nested transform/array_max/
    aggregate (O(|q|·|d|·dim) per row, inside whole-stage codegen), and
    top-k is a TakeOrderedAndProject — no UDF, no shuffle, scan-shaped
    exactly like brute-force cosine. At 10^12 docs put an ANN stage
    (LSH/IVF over pooled vectors) in front and re-rank candidates with
    this exact scorer."""
    qlit = F.array(
        *[F.array(*[F.lit(float(x)) for x in qv]) for qv in query_vecs]
    )
    dot = "aggregate(zip_with(qi, dj, (x, y) -> x * y), 0D, (s, x) -> s + x)"
    score = (
        f"aggregate(transform(__qs, qi -> array_max(transform("
        f"{vecs_col}, dj -> {dot}))), 0D, (s, x) -> s + x)"
    )
    return (
        df.withColumn("__qs", qlit)
        .withColumn("score", F.expr(score))
        .select(key, "score")
        .orderBy(F.desc("score"), F.asc(key))
        .limit(int(k))
    )
