"""Deduplication operators for training-data pipelines.

Four families, all deterministic (fixed seeds, content-derived hashes only):

- **exact**: content-hash groupBy — one shuffle on the hash key.
- **MinHash + LSH**: shingle → 64-bit hash → H permutation-minima signature
  (vectorized numpy inside a pandas UDF) → banded bucket join so candidate
  pairs only form inside an LSH bucket (never O(n²)); candidates verified
  with exact shingle-set Jaccard.
- **SimHash**: 64-bit weighted-bit fingerprint; near-dups found by the
  4×16-bit chunk pigeonhole (hamming ≤ 3 ⇒ at least one identical chunk),
  verified by exact hamming distance.
- **embedding cosine**: random-hyperplane LSH bucketing over normalized
  vectors, exact cosine verification of bucket-mates.

Scale notes: every family is bucket-join shaped — the only shuffles key on
(hash) or (band, signature), both uniformly distributed by construction, so
no skew: a 10^12-doc dedup is bounded by bucket width, not corpus size.
Candidate verification joins fetch shingle sets / vectors only for
candidate ids (semi-join pushdown).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE = (1 << 61) - 1
SEED = 42


def _perm_params(n_perm: int, seed: int = SEED) -> tuple[np.ndarray, np.ndarray]:
    """Permutation-hash coefficients sized so (a*h + b) NEVER overflows
    uint64 with a 32-bit shingle universe: a < 2^31, h < 2^32 → a*h < 2^63;
    + b < 2^61 stays < 2^64. Pure native-width numpy — no Python-object
    bigint math in the per-doc hot loop."""
    rng = np.random.Generator(np.random.Philox(key=[seed, 7]))
    a = rng.integers(1, 1 << 31, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE, size=n_perm, dtype=np.uint64)
    return a, b


def shingle_df(df: DataFrame, key: str, toks_col: str, k: int = 3) -> DataFrame:
    """tokens → distinct k-token shingles hashed to int64 (xxhash64,
    JVM-side)."""
    sh = F.array_distinct(
        F.expr(
            f"transform(sequence(0, size({toks_col})-{k}),"
            f" i -> concat_ws(' ', {', '.join(f'{toks_col}[i+{j}]' for j in range(k))}))"
        )
    )
    return (
        df.where(F.size(toks_col) >= k)
        .select(F.col(key).alias("__key"), F.explode(sh).alias("shingle"))
        .select("__key", F.xxhash64("shingle").alias("sh"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame, n_perm: int = 128, max_shingles_per_doc: int = 8192
) -> DataFrame:
    """(key, shingle-hash) → (key, signature array<long>[n_perm]).

    Pure-uint64 numpy kernel: shingle hashes are folded to a 32-bit
    universe (the exact-Jaccard VERIFY stays 64-bit; the sketch only
    drives candidate recall, where a ~2^-32 collision rate is noise), so
    (a*h + b) % p runs natively — no Python-object bigint math.

    Pathological giant docs are capped at ``max_shingles_per_doc``
    (deterministic bottom-k by hash value — a content-only sketch), so no
    per-doc collect_list ever materializes a multi-MB array."""
    a, b = _perm_params(n_perm)
    p = np.uint64(MERSENNE)
    mask32 = np.uint64(0xFFFFFFFF)

    @F.pandas_udf(ArrayType(LongType()))
    def sig_udf(sh_list: pd.Series) -> pd.Series:
        out = []
        for arr in sh_list:
            h = np.asarray(arr, dtype=np.int64).view(np.uint64) & mask32
            vals = (a[:, None] * h[None, :] + b[:, None]) % p
            out.append(np.min(vals, axis=1).astype(np.int64))
        return pd.Series(out)

    from pyspark.sql import Window

    capped = (
        shingles.withColumn(
            "__rk", F.row_number().over(Window.partitionBy("__key").orderBy("sh"))
        )
        .where(F.col("__rk") <= max_shingles_per_doc)
        .drop("__rk")
    )
    grouped = capped.groupBy("__key").agg(F.collect_list("sh").alias("shs"))
    return grouped.select("__key", sig_udf("shs").alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    key: str,
    toks_col: str,
    n_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by MinHash LSH, exact-Jaccard-verified.

    bands×rows = n_perm; candidate recall at j=threshold is
    1-(1-j^r)^bands (≈1-5e-8 for j=0.8, r=4, b=32). Returns (a, b, jaccard)
    with jaccard the EXACT shingle Jaccard of the verified pair."""
    rows = n_perm // bands
    sh = shingle_df(df, key, toks_col, k=shingle_k).persist()
    sigs = minhash_signatures(sh, n_perm)
    banded = sigs.select(
        "__key",
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" bd -> struct(bd, xxhash64(concat_ws(',', slice(sig, bd*{rows}+1, {rows}))) as h))"
            )
        ).alias("band"),
    ).select("__key", F.col("band.bd").alias("bd"), F.col("band.h").alias("bh"))
    cands = (
        banded.alias("x")
        .join(banded.alias("y"), ["bd", "bh"])
        .where(F.col("x.__key") < F.col("y.__key"))
        .select(F.col("x.__key").alias("a"), F.col("y.__key").alias("b"))
        .distinct()
    )
    sizes = sh.groupBy("__key").agg(F.count("*").alias("n_sh"))
    common = (
        cands.join(sh.withColumnRenamed("__key", "a"), "a")
        .join(sh.withColumnRenamed("__key", "b").withColumnRenamed("sh", "shb"), "b")
        .where(F.col("sh") == F.col("shb"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
    )
    out = (
        common.join(sizes.withColumnRenamed("__key", "a").withColumnRenamed("n_sh", "na"), "a")
        .join(sizes.withColumnRenamed("__key", "b").withColumnRenamed("n_sh", "nb"), "b")
        .withColumn("jaccard", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", F.round("jaccard", 4).alias("jaccard"))
    )
    return out


def simhash_fingerprints(
    df: DataFrame, key: str, toks_col: str, hash_fn: str = "xxhash64"
) -> DataFrame:
    """64-bit SimHash over term frequencies: bit_i = sign of
    Σ_t tf(t)·(±1 per bit of hash(t)). ``hash_fn``: ``xxhash64`` (default,
    JVM-native) or ``md5_60`` (first 60 bits of md5 — bit-identical in any
    engine with a standard md5, which is what makes the DuckDB oracle for
    ``dedup_simhash`` possible)."""
    th = (
        F.xxhash64("term")
        if hash_fn == "xxhash64"
        else F.expr("cast(conv(substring(md5(term), 1, 15), 16, 10) as bigint)")
    )
    tf = (
        df.select(F.col(key).alias("__key"), F.explode(toks_col).alias("term"))
        .groupBy("__key", "term")
        .agg(F.count("*").alias("tf"))
        .select("__key", "tf", th.alias("th"))
    )

    # per bit: sum(tf * (bit set ? +1 : -1)) > 0 → bit set. Vectorized as 64
    # conditional sums in one aggregation (JVM-side, map-combine).
    bit_cols = [
        F.sum(
            F.when(F.shiftright(F.col("th"), i).bitwiseAND(F.lit(1)) == 1, F.col("tf")).otherwise(
                -F.col("tf")
            )
        ).alias(f"b{i}")
        for i in range(64)
    ]
    votes = tf.groupBy("__key").agg(*bit_cols)
    fp = sum(
        (F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(1 << i) for i in range(1, 63)),
        F.when(F.col("b0") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    # bit 63 = the long's SIGN bit: setting it is adding -(2^63) in two's
    # complement (1 << 63 overflows the long literal). Dropping it — the
    # old behavior — underestimated hamming distances at the max_hamming
    # boundary, merging docs whose true 64-bit hashes differ by one extra bit.
    fp = fp + F.when(
        F.col("b63") > 0, F.lit(-9223372036854775808).cast("long")
    ).otherwise(F.lit(0).cast("long"))
    return votes.select("__key", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame, key: str, toks_col: str, max_hamming: int = 3,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming via the 4-chunk
    pigeonhole: ≤3 differing bits ⇒ at least one 16-bit chunk equal, so
    candidates come from 4 chunk-equality bucket joins, never O(n²)."""
    fps = simhash_fingerprints(df, key, toks_col, hash_fn=hash_fn).persist()
    chunks = fps.select(
        "__key",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("ci"),
                        F.shiftright(F.col("simhash"), i * 16).bitwiseAND(F.lit(0xFFFF)).alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("__key", "simhash", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    cands = (
        chunks.alias("x")
        .join(chunks.alias("y"), ["ci", "cv"])
        .where(F.col("x.__key") < F.col("y.__key"))
        .select(
            F.col("x.__key").alias("a"),
            F.col("y.__key").alias("b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
        .distinct()
    )
    return (
        cands.withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .where(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    key: str,
    vec_col: str,
    n_planes: int = 12,
    n_tables: int = 8,
    threshold: float = 0.95,
    seed: int = SEED,
    dim: int | None = None,
) -> DataFrame:
    """Near-identical embeddings: random-hyperplane LSH bucket join +
    exact cosine verify. One table's recall at angle θ is (1-θ/π)^planes;
    with L independent tables (unioned candidates) recall = 1-(1-p)^L.
    Defaults n_planes=12 / n_tables=8: recall ≈0.93 at cosine 0.95, ≈0.999
    at 0.99, →1 as cos→1 (the old 4-table default was only ≈0.73 at 0.95,
    and its docstring over-claimed 0.97; raise n_tables / lower n_planes
    for more recall at the cost of more candidates to verify)."""
    if dim is None:
        # an empty frame (or an all-null head) is a normal outcome of
        # upstream filtering — return an empty pairs frame, don't crash
        head = df.select(vec_col).where(F.col(vec_col).isNotNull()).first()
        if head is None:
            return df.sparkSession.createDataFrame(
                [], f"a {df.schema[key].dataType.simpleString()}, "
                    f"b {df.schema[key].dataType.simpleString()}, cosine double")
        dim = len(head[0])
    rng = np.random.Generator(np.random.Philox(key=[seed, 11]))
    planes = rng.normal(size=(n_tables, n_planes, dim))

    v = F.col(vec_col).cast("array<double>")
    base = df.select(F.col(key).alias("__key"), v.alias("__v"))
    tables = []
    for t in range(n_tables):
        plane_lits = F.array(*[F.array(*[F.lit(float(x)) for x in row]) for row in planes[t]])
        dot_plane = (
            "transform(__planes, p -> CASE WHEN "
            "aggregate(zip_with(p, __v, (x, y) -> x * y), 0D, (acc, x) -> acc + x) >= 0 "
            "THEN '1' ELSE '0' END)"
        )
        tables.append(
            base.withColumn("__planes", plane_lits)
            .withColumn("bucket", F.concat(F.lit(f"t{t}:"), F.expr(f"concat_ws('', {dot_plane})")))
            .drop("__planes")
        )
    bucketed = tables[0]
    for t in tables[1:]:
        bucketed = bucketed.unionByName(t)
    cands = (
        bucketed.alias("x")
        .join(bucketed.alias("y"), "bucket")
        .where(F.col("x.__key") < F.col("y.__key"))
        .select(
            F.col("x.__key").alias("a"),
            F.col("y.__key").alias("b"),
            F.col("x.__v").alias("va"),
            F.col("y.__v").alias("vb"),
        )
        .dropDuplicates(["a", "b"])
    )
    dot = "aggregate(zip_with(va, vb, (x, y) -> x * y), 0D, (acc, x) -> acc + x)"
    nrm = (
        "sqrt(aggregate(va, 0D, (acc, x) -> acc + x * x))"
        " * sqrt(aggregate(vb, 0D, (acc, x) -> acc + x * x))"
    )
    return (
        cands.withColumn("cosine", F.expr(f"({dot}) / ({nrm})"))
        .where(F.col("cosine") >= threshold)
        .select("a", "b", F.round("cosine", 4).alias("cosine"))
    )


def jaccard_pairs(
    shingles: DataFrame,
    threshold: float,
    key: str = "__key",
    sh_col: str = "sh",
) -> DataFrame:
    """All-pairs shingle-set Jaccard ≥ threshold via PREFIX FILTERING
    (Bayardo et al. WWW'07 "Scaling Up All Pairs Similarity Search";
    Chaudhuri et al. SSJoin lemma): under one global shingle order
    (rarity-first), two sets with |x∩y| ≥ α must already share their
    MINIMAL common element inside their first |·|−α+1 elements, so each
    doc indexes only its ℓ(d) = |d| − ⌈t·|d|⌉ + 1 globally-rarest
    shingles and candidates never form inside hot shingles — the
    quadratic killer of a plain shingle-inverted-index self-join (a
    boilerplate 3-gram shared by 10⁶ docs forms 10¹² pair rows at web
    scale; under prefix filtering it is indexed only by docs so small
    that it lands in their rarity prefix). LOSSLESS for Jaccard ≥ t:
    candidate generation is a superset of the qualifying pairs, and an
    exact common-count verify against the full sets restores equality
    with the naive join. A size-ratio filter (t·|x| ≤ |y|) prunes
    further; verification joins touch candidate ids only.

    Input: (key, sh) distinct shingle rows. Output: (a, b, jaccard).
    """
    from pyspark.sql import Window

    # hash shingles to int64 up front: every downstream shuffle/intersect
    # moves 8-byte keys, and the global rarity order only needs to be
    # CONSISTENT, not lexical (xxhash64 collisions are ~n²/2⁶⁵ — at that
    # odds a pair's jaccard shifts by one count, nothing is missed)
    shingles = shingles.select(key, F.xxhash64(sh_col).alias(sh_col))
    gdf = shingles.groupBy(sh_col).agg(F.count("*").alias("gdf"))
    # one shuffle by key serves both window functions (rank + set size)
    w_rank = Window.partitionBy(key).orderBy(F.asc("gdf"), F.asc(sh_col))
    w_all = Window.partitionBy(key)
    prefix = (
        shingles.join(gdf, sh_col)
        .select(
            key,
            sh_col,
            F.row_number().over(w_rank).alias("__rk"),
            F.count("*").over(w_all).alias("n"),
        )
        .where(F.col("__rk") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select(key, sh_col, "n")
    )
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), sh_col)
        .where(F.col(f"x.{key}") < F.col(f"y.{key}"))
        .where(F.col("y.n") >= F.lit(threshold) * F.col("x.n"))
        .where(F.col("x.n") >= F.lit(threshold) * F.col("y.n"))
        .select(
            F.col(f"x.{key}").alias("a"),
            F.col(f"y.{key}").alias("b"),
        )
        .distinct()
    )
    # exact verify: candidates fetch the two full sets (packed per-doc
    # arrays, bounded by doc length) and intersect JVM-side
    sets = shingles.groupBy(key).agg(F.collect_list(sh_col).alias("__set"))
    return (
        cand.join(sets.select(F.col(key).alias("a"), F.col("__set").alias("sa")), "a")
        .join(sets.select(F.col(key).alias("b"), F.col("__set").alias("sb")), "b")
        .withColumn("common", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.col("common") / (F.size("sa") + F.size("sb") - F.col("common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


def exact_dedup(df: DataFrame, key: str, content_col: str) -> DataFrame:
    """Exact dedup groups: md5 groupBy, min-key representative."""
    return (
        df.withColumn("__h", F.md5(F.col(content_col)))
        .groupBy("__h")
        .agg(F.min(key).alias("rep"), F.count("*").alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


def exact_substring_spans(
    df: DataFrame, key: str, toks_col: str, min_len: int = 50
) -> DataFrame:
    """Exact-substring dedup (ExactSubstr, Lee et al. 2021 "Deduplicating
    Training Data Makes Language Models Better"; the RefinedWeb pipeline's
    aggressive remove-all-occurrences variant): any token span of length
    >= ``min_len`` that appears more than once ANYWHERE in the corpus
    (across docs or repeated within one doc) is marked duplicated, and the
    union of all duplicated windows per doc is reported.

    Equivalence to the suffix-array formulation: a duplicated span of
    length m >= L contributes m-L+1 duplicated L-grams whose window union
    is exactly [s, s+m) — so the union of duplicated-L-gram windows equals
    the union of maximal duplicated spans. No suffix array needed; the
    whole thing is three dataframe stages.

    Plan shape at 100 TB: per-doc gram hashing is a JVM ``transform`` over
    the token array (no UDF); the only shuffles key on (a) the 64-bit gram
    hash — uniform by construction — for the count>=2 filter (partial
    map-side count applies), and (b) the doc key to re-assemble per-doc
    duplicated-start lists (bounded by per-doc token count). The interval
    union length is a higher-order ``aggregate`` over the sorted start
    list — no window functions, no driver collect. Per-doc cost is
    O(n_tokens * L) hashed bytes (windowed concat); a rolling polynomial
    hash would drop that to O(n_tokens) without changing any join shape.

    Returns (key, n_tokens, dup_tokens, kept_tokens, dup_starts) — one row
    per input doc, dup_starts = sorted starts of duplicated windows.
    """
    L = int(min_len)
    base = df.select(
        F.col(key).alias(key), F.col(toks_col).alias("__t")
    ).withColumn("__n", F.size("__t"))
    grams = base.where(F.col("__n") >= L).select(
        key,
        F.posexplode(
            F.expr(
                f"transform(sequence(0, __n - {L}),"
                f" i -> xxhash64(concat_ws(' ', slice(__t, i + 1, {L}))))"
            )
        ).alias("s", "g"),
    )
    dup_g = grams.groupBy("g").count().where(F.col("count") >= 2).select("g")
    per_doc = (
        grams.join(dup_g, "g", "left_semi")
        .groupBy(key)
        .agg(F.sort_array(F.collect_list("s")).alias("dup_starts"))
    )
    out = base.join(per_doc, key, "left").withColumn(
        "dup_starts",
        F.coalesce("dup_starts", F.expr("cast(array() as array<int>)")),
    )
    # union length of the (sorted, equal-width-L) windows: fold carrying
    # (covered_so_far, current_max_end); each window [x, x+L) adds
    # max(0, x+L - max(end, x)) — exact interval-union arithmetic.
    dup_len = F.expr(
        f"""aggregate(dup_starts, named_struct('d', 0L, 'e', -1L),
              (acc, x) -> named_struct(
                'd', acc.d + greatest(0L, cast(x as bigint) + {L}
                       - greatest(acc.e, cast(x as bigint))),
                'e', greatest(acc.e, cast(x as bigint) + {L})),
              acc -> acc.d)"""
    )
    return (
        out.withColumn("dup_tokens", dup_len)
        .withColumn("n_tokens", F.col("__n").cast("long"))
        .withColumn("kept_tokens", F.col("n_tokens") - F.col("dup_tokens"))
        .select(key, "n_tokens", "dup_tokens", "kept_tokens", "dup_starts")
    )


def exact_substring_dedup(
    df: DataFrame, key: str, toks_col: str, min_len: int = 50
) -> DataFrame:
    """Apply exact-substring dedup: remove every duplicated window from the
    token stream (see exact_substring_spans for semantics + scale notes).
    Returns (key, kept_toks) with the surviving tokens in original order.

    The merged-interval array is built by the same fold (append-or-extend
    the last interval — starts are sorted so only the tail can merge), then
    tokens are kept when no interval covers their index. Membership is
    ``exists`` over the merged intervals: O(n_tokens * n_spans) per doc,
    all inside whole-stage codegen."""
    L = int(min_len)
    spans = exact_substring_spans(df, key, toks_col, L)
    base = df.select(F.col(key).alias(key), F.col(toks_col).alias("__t"))
    j = base.join(spans.select(key, "dup_starts"), key, "left")
    intervals = F.expr(
        f"""aggregate(
              coalesce(dup_starts, cast(array() as array<int>)),
              cast(array() as array<struct<lo: bigint, hi: bigint>>),
              (acc, x) -> case
                when size(acc) > 0 and cast(x as bigint) <= element_at(acc, -1).hi
                then concat(
                  slice(acc, 1, size(acc) - 1),
                  array(named_struct(
                    'lo', element_at(acc, -1).lo,
                    'hi', greatest(element_at(acc, -1).hi,
                                   cast(x as bigint) + {L}))))
                else concat(acc, array(named_struct(
                  'lo', cast(x as bigint), 'hi', cast(x as bigint) + {L})))
              end)"""
    )
    kept = F.expr(
        "filter(__t, (tok, i) -> not exists(__iv,"
        " v -> i >= v.lo and i < v.hi))"
    )
    return (
        j.withColumn("__iv", intervals)
        .withColumn("kept_toks", kept)
        .select(key, "kept_toks")
    )


def connected_components(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b", max_iter: int = 20
) -> DataFrame:
    """Near-dup pairs → clusters: iterative min-label propagation
    (the alternating-star style algorithm; converges in O(component
    diameter) rounds — near-dup components are shallow, typically 2-5).
    Returns (id, component) with component = the MINIMUM member id —
    deterministic canonical labels. Each round is one groupBy over the
    undirected edge list; the loop runs driver-side but every iteration
    is a distributed job (no per-row driver work). Each round's labels
    are EAGERLY checkpointed (localCheckpoint; a reliable checkpoint dir
    on a real cluster) — without lineage truncation the iterative plan
    grows exponentially and kills the driver."""
    edges = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .unionByName(pairs.select(F.col(b_col).alias("x"), F.col(a_col).alias("y")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # candidate label per node = min(own, neighbours' labels)
        nbr = (
            edges.join(labels.withColumnRenamed("id", "y"), "y")
            .groupBy(F.col("x").alias("id"))
            .agg(F.min("component").alias("nc"))
        )
        new_labels = (
            labels.join(nbr, "id", "left")
            .select("id", F.least("component", F.coalesce("nc", "component")).alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds max_iter) — raise max_iter; "
            "returning split components would silently under-dedup"
        )
    edges.unpersist()
    return labels


def keep_canonical(
    df: DataFrame, pairs: DataFrame, key: str, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """The dedup SELECTION step: drop every non-canonical member of each
    near-dup component (canonical = minimum key — deterministic). Docs in
    no component always survive. One anti-join against the non-canonical
    id set."""
    comp = connected_components(pairs, a_col, b_col)
    losers = comp.where(F.col("id") != F.col("component")).select(
        F.col("id").alias(key)
    )
    return df.join(losers, key, "left_anti")


def line_dedup(
    df: DataFrame, key: str, text_col: str, sep: str = "\n"
) -> DataFrame:
    """Corpus-level line/paragraph dedup (the CCNet first stage, Wenzek et
    al. 2020 §3.1, also RefinedWeb's line-wise dedup): every line whose
    exact content appears elsewhere in the corpus is dropped EXCEPT the
    globally first occurrence (ordered by (doc key, line number) — the
    deterministic stand-in for shard order). Unique lines always survive;
    surviving lines are reassembled in their original order.

    Scale shape: posexplode on ``sep`` → ONE groupBy on the line content
    computing the keeper occurrence as ``min(struct(key, line_no))`` —
    partial map-side aggregation absorbs boilerplate-hot lines ("click
    here" × 10^9), there is NO window over the content key, so no
    single-task skew — then an inner join of occurrences against keepers
    (co-partitioned on the line) and a regroup on the doc key for
    reassembly.

    Returns (key, n_lines, kept_lines, text_dedup).
    """
    lines = df.select(
        F.col(key).alias(key),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__ln", "__line"),
    )
    keepers = lines.groupBy("__line").agg(
        F.min(F.struct(F.col(key).alias("k"), F.col("__ln").alias("n"))).alias("__keep")
    )
    kept = lines.join(keepers, "__line").where(
        (F.col(key) == F.col("__keep.k")) & (F.col("__ln") == F.col("__keep.n"))
    )
    per_doc = kept.groupBy(key).agg(
        F.count("*").alias("kept_lines"),
        F.array_join(
            F.expr("transform(sort_array(collect_list(struct(__ln, __line))),"
                   " x -> x.__line)"),
            sep,
        ).alias("text_dedup"),
    )
    return (
        df.select(
            F.col(key).alias(key),
            F.size(F.split(F.col(text_col), sep)).cast("long").alias("n_lines"),
        )
        .join(per_doc, key, "left")
        .select(
            key,
            "n_lines",
            F.coalesce(F.col("kept_lines"), F.lit(0)).cast("long").alias("kept_lines"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )
