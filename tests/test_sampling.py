"""Training-data sampling/mixing/packing operators (operators/sampling.py)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from elasticsearch_spark.operators.sampling import (
    domain_cap,
    pack_sequences,
    source_mix,
)


def test_domain_cap_counts_and_losslessness(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(90)], "doc_id long, domain string"
    ).repartition(7)
    out = domain_cap(df, "domain", "doc_id", cap=5)
    counts = {r.domain: r.n for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()}
    assert counts == {"d0": 5, "d1": 5, "d2": 5}
    # survivors must equal the single-phase global window result (the
    # two-phase pre-truncation is lossless)
    w = Window.partitionBy("domain").orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    expect = (
        df.withColumn("__r", F.row_number().over(w)).where(F.col("__r") <= 5)
        .select("doc_id").orderBy("doc_id")
    )
    got = out.select("doc_id").orderBy("doc_id")
    assert [r.doc_id for r in got.collect()] == [r.doc_id for r in expect.collect()]


def test_domain_cap_under_cap_domain_untouched(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "doc_id long, domain string"
    )
    out = domain_cap(df, "domain", "doc_id", cap=10)
    assert out.count() == 3


def test_source_mix_deterministic_rates(spark):
    df = spark.createDataFrame(
        [(i, "keep" if i % 2 else "drop") for i in range(200)],
        "doc_id long, src string",
    )
    out = source_mix(df, "src", "doc_id", rates={"drop": 0.0, "keep": 1.0}, modulus=100)
    rows = out.collect()
    assert all(r.src == "keep" for r in rows)
    assert len(rows) == 100
    # deterministic: same survivors on re-run
    again = source_mix(df, "src", "doc_id", rates={"drop": 0.0, "keep": 1.0}, modulus=100)
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again.collect())


def test_source_mix_string_key_uses_hash(spark):
    df = spark.createDataFrame(
        [(f"u{i}", "s") for i in range(1000)], "url string, src string"
    )
    out = source_mix(df, "src", "url", rates={"s": 0.5}, modulus=1000)
    n = out.count()
    assert 350 < n < 650  # hash-uniform ±15%


def test_pack_sequences_global(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (4, 30), (5, 300)],
        "doc_id long, n_tokens long",
    )
    out = {r.doc_id: (r.seq_id, r.seq_offset) for r in
           pack_sequences(df, "doc_id", "n_tokens", budget=256).collect()}
    # cum_before: 0, 100, 200, 300, 330
    assert out == {1: (0, 0), 2: (0, 100), 3: (0, 200), 4: (1, 44), 5: (1, 74)}


def test_pack_sequences_partition_scope_ids_distinct(spark):
    df = spark.createDataFrame(
        [(i, 100) for i in range(40)], "doc_id long, n_tokens long"
    ).repartition(4)
    out = pack_sequences(df, "doc_id", "n_tokens", budget=256, scope="partition")
    rows = out.collect()
    # offsets stay within budget, and (seq_id, seq_offset) is unique per doc
    assert all(0 <= r.seq_offset < 256 for r in rows)
    assert len({(r.seq_id, r.seq_offset) for r in rows}) == 40


def test_flag_contaminated(spark):
    from elasticsearch_spark.operators.sampling import flag_contaminated

    probe_sent = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, f"intro text then {probe_sent} and more trailing words"),
            (2, "completely unrelated content about databases and spark"),
            (3, "the quick brown fox stops here"),  # only a 4-gram overlap
        ],
        "doc_id long, text string",
    )
    probes = spark.createDataFrame([(probe_sent,)], "text string")
    flagged = [r.doc_id for r in flag_contaminated(docs, probes, n=8).collect()]
    assert flagged == [1]
    # lowering n to 4 catches the partial overlap too
    flagged4 = sorted(
        r.doc_id for r in flag_contaminated(docs, probes, n=4).collect()
    )
    assert flagged4 == [1, 3]
