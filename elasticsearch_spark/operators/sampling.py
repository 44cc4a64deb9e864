"""Training-data sampling / mixing / packing operators.

The corpus-shaping steps every large-scale LLM data pipeline runs after
dedup and quality filtering (the Dolma / RedPajama / C4 recipe layer):

- ``domain_cap``: cap documents per source/domain (domain balancing) with a
  deterministic priority, so one hot domain can't dominate the mix.
- ``source_mix``: per-source sampling rates (up/down-weighting a mixture),
  deterministic in the document key — re-runs pick the same documents.
- ``pack_sequences``: concatenate-and-chunk documents into fixed-token-budget
  training sequences (GPT-style packing): every document gets (seq_id,
  offset) coordinates in the packed stream.

Scale notes (100 TB):
- domain_cap is two-phase lossless: each partition first keeps only its own
  best ``cap`` rows per source (mapPartitions-free — one groupBy-limit shaped
  window over partition-local data via repartition-by-source is NOT needed);
  the global top-cap is a subset of the union of per-partition top-caps, so
  the final window sort runs over ≤ cap·P rows per source instead of the
  full corpus. Hot domains stop being a skew problem before the shuffle.
- source_mix is a pure filter — no shuffle, full codegen, pushdown-friendly.
- pack_sequences with scope="partition" assigns sequence ids namespaced by
  partition (zero global coordination — the production path); scope="global"
  orders by the key for a fully deterministic single stream (costs a global
  sort — the oracle/test path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def domain_cap(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    cap: int,
    partition_parallelism: int | None = None,
) -> DataFrame:
    """Keep at most ``cap`` documents per domain, by deterministic priority
    (md5 of the key — stable across runs and cluster sizes; ties broken by
    the key itself).

    Two-phase: a per-partition pre-truncation bounds every partition's
    contribution to ``cap`` rows per domain (the global winners are
    necessarily inside that union), then one window rank finishes. The
    shuffled volume per domain is ≤ cap × partitions, independent of how
    hot the domain is."""
    pr = F.md5(F.col(key_col).cast("string")).alias("__pri")
    local_w = Window.partitionBy(F.spark_partition_id(), domain_col).orderBy(
        "__pri", key_col
    )
    pre = (
        df.withColumn("__pri", pr)
        .withColumn("__lr", F.row_number().over(local_w))
        .where(F.col("__lr") <= cap)
        .drop("__lr")
    )
    w = Window.partitionBy(domain_col).orderBy("__pri", key_col)
    return (
        pre.withColumn("__r", F.row_number().over(w))
        .where(F.col("__r") <= cap)
        .drop("__r", "__pri")
    )


def source_mix(
    df: DataFrame,
    domain_col: str,
    key_col: str,
    rates: dict[str, float],
    default_rate: float = 1.0,
    modulus: int = 10_000,
) -> DataFrame:
    """Deterministic per-source sampling: keep a row iff
    ``hash(key) % modulus < rate·modulus`` for its source's rate — the same
    rows survive on every run and at every cluster size. Pure filter: no
    shuffle, whole-stage codegen. The hash is ``xxhash64``; tests/oracles
    can pass ``hash_expr`` via the key column being an integer id (then
    ``key % modulus`` is used verbatim for cross-engine reproducibility)."""
    from pyspark.sql.types import IntegralType

    is_int = isinstance(df.schema[key_col].dataType, IntegralType)
    h = (
        F.pmod(F.col(key_col), F.lit(modulus))
        if is_int
        else F.pmod(F.xxhash64(F.col(key_col)), F.lit(modulus))
    )
    rate_col = F.lit(default_rate)
    for src, r in rates.items():
        rate_col = F.when(F.col(domain_col) == src, F.lit(float(r))).otherwise(rate_col)
    return df.where(h < rate_col * modulus)


def flag_contaminated(
    docs: DataFrame,
    probes: DataFrame,
    doc_key: str = "doc_id",
    text_col: str = "text",
    probe_text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination (the GPT-3 appendix-C / LLaMA recipe):
    flag a training document when any word n-gram of an evaluation probe
    appears verbatim in it. Both sides tokenize with the same [a-z0-9]+
    analyzer, n-grams are md5-hashed, and the flagging is one distinct
    semi-join — docs explode to (doc, gram-hash) once, probes form the
    (small) broadcast side. Returns the distinct contaminated doc keys.

    Scale shape: the doc side is |corpus| × (tokens − n + 1) hashed rows but
    never materialized wide (project-explode-hash in one codegen stage);
    the probe gram set is benchmark-sized (thousands) → broadcast
    semi-join, no shuffle of the corpus."""
    tok = "regexp_extract_all(lower({c}), '[a-z0-9]+', 0)"

    def grams(frame: DataFrame, key_cols: list[str], col: str) -> DataFrame:
        # tokenize ONCE into a column — the regex over the full document is
        # this operator's dominant cost and catalyst won't CSE it across
        # the guard and the two lambda references
        toked = frame.select(
            *key_cols, F.expr(tok.format(c=col)).alias("__toks")
        ).where(F.size("__toks") >= n)
        g = F.expr(
            f"transform(sequence(0, size(__toks) - {n}),"
            f" i -> md5(array_join(slice(__toks, i + 1, {n}), ' ')))"
        )
        return toked.select(*key_cols, F.explode(g).alias("__g"))

    doc_grams = grams(docs, [doc_key], text_col)
    probe_grams = grams(probes, [], probe_text_col).distinct()
    return (
        doc_grams.join(F.broadcast(probe_grams), "__g", "left_semi")
        .select(doc_key)
        .distinct()
    )


_GRAMS = (
    "concat(__toks, case when size(__toks) >= 2 then"
    " transform(sequence(0, size(__toks) - 2),"
    " i -> concat_ws(' ', slice(__toks, i + 1, 2)))"
    " else slice(__toks, 1, 0) end)"
)


def _gram_buckets(frame: DataFrame, key_cols: list[str], text_col: str,
                  buckets: int) -> DataFrame:
    """(keys…, bucket) — one row per unigram/bigram occurrence, hashed into
    ``buckets`` via the first 8 hex digits of md5 (cross-engine stable:
    DuckDB mirrors it with digit-wise hex decoding). Pure codegen
    project-explode — never materialized wide."""
    toked = frame.select(
        *key_cols,
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)").alias("__toks"),
    )
    g = F.explode(F.expr(_GRAMS)).alias("__g")
    return toked.select(*key_cols, g).select(
        *key_cols,
        F.pmod(
            F.conv(F.substring(F.md5("__g"), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ).alias("bucket"),
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    key_col: str,
    text_col: str,
    *,
    buckets: int = 4096,
    alpha: float = 0.5,
    target_text_col: str | None = None,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, *Data Selection for Language
    Models via Importance Resampling*): bag-of-hashed-ngrams generative
    models for the target and raw corpora, per-document log importance
    weight ``log p_target(doc) − log p_raw(doc)``.

    Both distributions are Laplace-smoothed (``alpha`` per bucket) so unseen
    buckets stay finite. Returns ``(key_col, logw)``.

    Scale: two gram-count groupBys (map-side partial agg over the explode
    stream, ≤ ``buckets`` result rows each), the per-bucket log-ratio table
    is ≤ ``buckets`` rows → broadcast joined back to the raw gram stream,
    then one per-document sum. No all-pairs, no driver state."""
    b = float(buckets)
    tgt = _gram_buckets(
        target, [], target_text_col or text_col, buckets
    ).groupBy("bucket").agg(F.count("*").cast("double").alias("ct"))
    rawc = _gram_buckets(raw, [], text_col, buckets).groupBy("bucket").agg(
        F.count("*").cast("double").alias("cq")
    )
    totals = tgt.agg(F.sum("ct").alias("nt")).crossJoin(
        rawc.agg(F.sum("cq").alias("nq"))
    )
    ratio = (
        tgt.join(rawc, "bucket", "full_outer")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.coalesce("ct", F.lit(0.0)) + alpha) / (F.col("nt") + alpha * b))
                - F.log((F.coalesce("cq", F.lit(0.0)) + alpha) / (F.col("nq") + alpha * b))
            ).alias("lr"),
        )
    )
    doc_grams = _gram_buckets(raw, [key_col], text_col, buckets)
    return (
        doc_grams.join(F.broadcast(ratio), "bucket")
        .groupBy(key_col)
        .agg(F.sum("lr").alias("logw"))
    )


def dsir_resample(
    raw: DataFrame,
    target: DataFrame,
    key_col: str,
    text_col: str,
    k: int,
    *,
    buckets: int = 4096,
    alpha: float = 0.5,
    target_text_col: str | None = None,
) -> DataFrame:
    """Gumbel-top-k importance resampling without replacement (the DSIR
    selection step): sample ``k`` documents from the raw corpus with
    probability ∝ importance weight by taking the top ``k`` of
    ``logw + Gumbel(0,1)``.

    The Gumbel noise is DETERMINISTIC in the document key (a 31-bit
    multiplicative-congruential uniform), so re-runs — and reruns at any
    cluster size — select identical documents, and a plain-SQL oracle can
    reproduce the draw exactly. Returns ``(key_col, logw, gkey)`` for the
    selected documents. Top-k is TakeOrderedAndProject — ≤ k rows ever
    leave the executors."""
    w = dsir_weights(
        raw, target, key_col, text_col,
        buckets=buckets, alpha=alpha, target_text_col=target_text_col,
    )
    from pyspark.sql.types import NumericType

    m = F.lit(2147483647)
    if isinstance(w.schema[key_col].dataType, NumericType):
        key_int = F.col(key_col).cast("long")
    else:
        # string/other keys: cast("long") would be NULL for every row and
        # the draw would silently collapse to key order — fold a
        # deterministic integer from md5 instead (mirrorable in plain SQL,
        # like the numeric formula the oracle pins)
        key_int = F.conv(
            F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
        ).cast("long")
    u = (
        F.pmod(F.pmod(key_int, m) * F.lit(2654435761) + 101, m)
        + 1
    ) / F.lit(2147483649.0)
    return (
        w.withColumn("gkey", F.col("logw") - F.log(-F.log(u)))
        .orderBy(F.desc("gkey"), F.asc(key_col))
        .limit(k)
    )


def pack_sequences(
    df: DataFrame,
    key_col: str,
    tokens_col: str,
    budget: int,
    scope: str = "global",
) -> DataFrame:
    """Concatenate-and-chunk packing (the GPT-style training-sequence
    layout): documents are laid out in ``key_col`` order into one token
    stream and cut every ``budget`` tokens. Returns the input columns plus
    ``seq_id`` (which training sequence the document STARTS in) and
    ``seq_offset`` (token offset within that sequence).

    scope="global": one deterministic stream (global sort by key).
    scope="partition": per-partition streams, seq ids namespaced by
    partition id — no global coordination, the 100 TB path."""
    t = F.col(tokens_col).cast("long")
    if scope == "global":
        w = Window.orderBy(key_col)
        out = df.withColumn(
            "__cum_before",
            F.coalesce(
                F.sum(t).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
            ),
        )
        return (
            out.withColumn("seq_id", (F.col("__cum_before") / budget).cast("long"))
            .withColumn(
                "seq_offset", F.col("__cum_before") - F.col("seq_id") * budget
            )
            .drop("__cum_before")
        )
    if scope == "partition":
        w = Window.partitionBy(F.spark_partition_id()).orderBy(key_col)
        out = (
            df.withColumn("__pid", F.spark_partition_id().cast("long"))
            .withColumn(
                "__cum_before",
                F.coalesce(
                    F.sum(t).over(w.rowsBetween(Window.unboundedPreceding, -1)),
                    F.lit(0),
                ),
            )
        )
        # seq ids are (partition id, local seq) packed into one long —
        # distinct across partitions without any global pass
        return (
            out.withColumn(
                "seq_id",
                F.col("__pid") * F.lit(1 << 40)
                + (F.col("__cum_before") / budget).cast("long"),
            )
            .withColumn(
                "seq_offset", F.pmod(F.col("__cum_before"), F.lit(budget))
            )
            .drop("__cum_before", "__pid")
        )
    raise ValueError(f"unsupported scope: {scope}")
