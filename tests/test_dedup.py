"""Dedup operator tests: MinHash+LSH, SimHash, embedding LSH, exact —
deterministic, candidate-generation never O(n²) (bucket joins only)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators import dedup


@pytest.fixture(scope="module")
def doc_corpus(spark):
    base = "the quick brown fox jumps over the lazy dog while rain falls on the plain".split()
    rows = []
    for i in range(20):
        words = list(base)
        words[0] = f"doc{i}"  # all distinct
        rows.append((i, " ".join(words)))
    # near-dups of doc 0: one word changed / appended
    near = list(base)
    near[0] = "doc0"
    near[5] = "leaps"
    rows.append((100, " ".join(near)))
    rows.append((101, " ".join(["doc0"] + base[1:] + ["extra"])))
    # exact dup of doc 3's text
    rows.append((102, rows[3][1]))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return df.withColumn("toks", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))


def test_exact_dedup(spark, doc_corpus):
    got = dedup.exact_dedup(doc_corpus, "doc_id", "text").collect()
    assert len(got) == 1
    assert got[0]["rep"] == 3 and got[0]["n_dups"] == 2


def test_minhash_lsh_finds_near_dups(spark, doc_corpus):
    pairs = dedup.minhash_lsh_pairs(
        doc_corpus, "doc_id", "toks", n_perm=64, bands=16, threshold=0.5
    ).collect()
    found = {(r["a"], r["b"]) for r in pairs}
    assert (0, 100) in found
    assert (0, 101) in found
    assert (3, 102) in found  # exact dup: jaccard 1.0
    j = {(r["a"], r["b"]): r["jaccard"] for r in pairs}
    assert j[(3, 102)] == 1.0
    # unrelated docs (distinct first word only → high jaccard!) — all docs
    # here share the base text, so the sanity check is the jaccard VALUE:
    assert all(r["jaccard"] >= 0.5 for r in pairs)


def test_minhash_estimate_tracks_exact(spark, doc_corpus):
    """MinHash signature agreement rate ≈ exact Jaccard (the sketch
    property), checked on the (0, 100) pair."""
    sh = dedup.shingle_df(doc_corpus.where(F.col("doc_id").isin([0, 100])), "doc_id", "toks")
    sigs = {r["__key"]: np.array(r["sig"]) for r in dedup.minhash_signatures(sh, 128).collect()}
    est = float(np.mean(sigs[0] == sigs[100]))
    rows = sh.groupBy("__key").agg(F.collect_set("sh").alias("s")).collect()
    sets = {r["__key"]: set(r["s"]) for r in rows}
    exact = len(sets[0] & sets[100]) / len(sets[0] | sets[100])
    assert abs(est - exact) < 0.15


def test_simhash_exact_dup_zero_hamming(spark, doc_corpus):
    pairs = dedup.simhash_pairs(doc_corpus, "doc_id", "toks", max_hamming=3).collect()
    d = {(r["a"], r["b"]): r["hamming"] for r in pairs}
    assert d.get((3, 102)) == 0  # identical text → identical fingerprint


def test_simhash_determinism(spark, doc_corpus):
    a = {r["__key"]: r["simhash"] for r in dedup.simhash_fingerprints(doc_corpus, "doc_id", "toks").collect()}
    b = {r["__key"]: r["simhash"] for r in dedup.simhash_fingerprints(doc_corpus, "doc_id", "toks").collect()}
    assert a == b


def test_embedding_near_dup(spark):
    rng = np.random.Generator(np.random.Philox(key=[1, 2]))
    base = rng.normal(size=32)
    rows = []
    for i in range(30):
        v = rng.normal(size=32)
        rows.append((i, [float(x) for x in v]))
    rows.append((100, [float(x) for x in base]))
    rows.append((101, [float(x) for x in base + rng.normal(size=32) * 0.01]))  # ~same direction
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = dedup.embedding_near_dup_pairs(df, "vec_id", "embedding", n_planes=8, threshold=0.95).collect()
    found = {(r["a"], r["b"]): r["cosine"] for r in pairs}
    assert (100, 101) in found
    assert found[(100, 101)] > 0.99
    # random 32-dim pairs essentially never reach cosine 0.95
    assert all(k == (100, 101) for k in found)


def test_connected_components_and_canonical(spark):
    from elasticsearch_spark.operators.dedup import connected_components, keep_canonical

    # components: {1,2,3,4} (chain), {7,9}, singletons 5, 6 untouched
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (7, 9)], "a long, b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 7: 7, 9: 7}
    docs = spark.createDataFrame([(i, f"d{i}") for i in [1, 2, 3, 4, 5, 6, 7, 9]],
                                 "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in keep_canonical(docs, pairs, "doc_id").collect())
    assert kept == [1, 5, 6, 7]  # one canonical per component + singletons


def test_connected_components_long_chain(spark):
    from elasticsearch_spark.operators.dedup import connected_components

    # a 12-node path needs multiple propagation rounds
    pairs = spark.createDataFrame([(i, i + 1) for i in range(12)], "a long, b long")
    comp = connected_components(pairs).collect()
    assert {r["component"] for r in comp} == {0}
    assert len(comp) == 13


def test_connected_components_nonconvergence_raises(spark):
    from elasticsearch_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(i, i + 1) for i in range(25)], "a long, b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=5)


def test_jaccard_pairs_prefix_filter_lossless(spark):
    """jaccard_pairs (prefix filtering) must return EXACTLY the pairs a
    naive shingle-inverted-index self-join returns, across thresholds —
    the SSJoin-lemma losslessness, on adversarial data: one ultra-hot
    shingle shared by every doc plus random rare tails."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for d in range(40):
        # every doc starts with the same hot trigram; tail random
        words = ["hot", "hot", "hot"] + list(rng.choice(vocab, size=rng.integers(3, 12)))
        rows.append((d, words))
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>")
    sh = df.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(0, size(toks)-3),"
                    " i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"
                )
            )
        ).alias("shingle"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    naive = (
        sh.alias("x").join(sh.alias("y"), "shingle")
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .agg(F.count("*").alias("common"))
        .join(sizes.withColumnRenamed("doc_id", "a").withColumnRenamed("n", "na"), "a")
        .join(sizes.withColumnRenamed("doc_id", "b").withColumnRenamed("n", "nb"), "b")
        .withColumn("j", F.col("common") / (F.col("na") + F.col("nb") - F.col("common")))
    )
    n_at_loosest = None
    for t in (0.3, 0.5, 0.8):
        want = {
            (r["a"], r["b"], round(r["j"], 6))
            for r in naive.where(F.col("j") >= t).collect()
        }
        got = {
            (r["a"], r["b"], round(r["jaccard"], 6))
            for r in dedup.jaccard_pairs(sh, t, key="doc_id", sh_col="shingle").collect()
        }
        assert got == want, (t, got ^ want)
        if n_at_loosest is None:
            n_at_loosest = len(want)
    assert n_at_loosest > 0  # the comparison must actually exercise pairs


def test_exact_substring_spans(spark):
    # L=4; docs A and B share the 6-token run w1..w6 (aligned anywhere),
    # doc C repeats a 5-token run WITHIN itself, doc D has no duplication.
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"a0 a1 {shared} a2 a3"),
        (2, f"b0 {shared} b1 b2 b3 b4"),
        (3, "c0 one two three four five c1 c2 one two three four five c3"),
        (4, "d0 d1 d2 d3 d4 d5 d6 d7 d8 d9"),
        (5, "e0 e1"),  # shorter than L — no grams, survives with 0 dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "toks", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in dedup.exact_substring_spans(df, "doc_id", "toks", min_len=4).collect()
    }
    # shared run = 6 tokens => union of duplicated 4-gram windows = 6 in both
    assert (out[1]["dup_tokens"], out[1]["n_tokens"]) == (6, 10)
    assert out[1]["dup_starts"] == [2, 3, 4]  # starts of the 3 dup 4-grams
    assert (out[2]["dup_tokens"], out[2]["kept_tokens"]) == (6, 5)  # n=11
    # within-doc repeat: 5-token run duplicated at offsets 1 and 9 => 10 total
    assert out[3]["dup_tokens"] == 10
    assert out[4]["dup_tokens"] == 0 and out[4]["kept_tokens"] == 10
    assert out[5]["dup_tokens"] == 0 and out[5]["n_tokens"] == 2


def test_exact_substring_dedup_removes_spans(spark):
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [
        (1, f"a0 a1 {shared} a2 a3"),
        (2, f"b0 {shared} b1 b2 b3 b4"),
        (4, "d0 d1 d2 d3 d4 d5 d6 d7 d8 d9"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "toks", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    )
    out = {
        r["doc_id"]: r["kept_toks"]
        for r in dedup.exact_substring_dedup(df, "doc_id", "toks", min_len=4).collect()
    }
    assert out[1] == ["a0", "a1", "a2", "a3"]
    assert out[2] == ["b0", "b1", "b2", "b3", "b4"]
    assert out[4] == "d0 d1 d2 d3 d4 d5 d6 d7 d8 d9".split()


def test_exact_substring_overlapping_islands(spark):
    # Two overlapping duplicated runs in one doc must merge into one span:
    # doc 1 shares [p1..p5] with doc 2 and [p4..p8] with doc 3 (L=4) —
    # union in doc 1 covers p1..p8 contiguously (8 tokens), not 5+5.
    rows = [
        (1, "x0 p1 p2 p3 p4 p5 p6 p7 p8 x1"),
        (2, "y0 y1 p1 p2 p3 p4 p5 y2"),
        (3, "z0 p4 p5 p6 p7 p8 z1 z2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "toks", F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    )
    out = {
        r["doc_id"]: r["dup_tokens"]
        for r in dedup.exact_substring_spans(df, "doc_id", "toks", min_len=4).collect()
    }
    assert out[1] == 8  # merged island p1..p8
    assert out[2] == 5 and out[3] == 5


def test_line_dedup_multiline(spark):
    rows = [
        (1, "intro\nshared boilerplate\nunique to one"),
        (2, "shared boilerplate\nsecond doc body\nshared boilerplate"),
        (3, "third doc\nsecond doc body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in
           dedup.line_dedup(df, "doc_id", "text").collect()}
    # doc 1 holds the first occurrence of the boilerplate -> all kept
    assert out[1]["text_dedup"] == rows[0][1]
    assert (out[1]["n_lines"], out[1]["kept_lines"]) == (3, 3)
    # doc 2 loses BOTH copies (first occurrence lives in doc 1);
    # within-doc repeat also deduped; keeps its own first-of-corpus line
    assert out[2]["text_dedup"] == "second doc body"
    assert (out[2]["n_lines"], out[2]["kept_lines"]) == (3, 1)
    # doc 3 loses the line doc 2 already owns
    assert out[3]["text_dedup"] == "third doc"
    # doc whose every line is owned elsewhere -> empty text, 0 kept
    df2 = spark.createDataFrame(
        rows + [(4, "intro\nthird doc")], "doc_id long, text string")
    out2 = {r["doc_id"]: r.asDict() for r in
            dedup.line_dedup(df2, "doc_id", "text").collect()}
    assert (out2[4]["kept_lines"], out2[4]["text_dedup"]) == (0, "")


def test_simhash_uses_full_64_bits(spark):
    from elasticsearch_spark.operators.dedup import simhash_fingerprints

    df = spark.createDataFrame(
        [(i, [f"w{i}a", f"w{i}b", f"w{i}c"]) for i in range(24)],
        "id long, toks array<string>")
    fps = [r["simhash"] for r in simhash_fingerprints(df, "id", "toks").collect()]
    # bit 63 (the sign bit) must be live: across 24 random token sets the
    # odds of every bit-63 vote landing 0 are ~2^-24
    assert any(f < 0 for f in fps)


def test_embedding_near_dup_empty_frame(spark):
    from elasticsearch_spark.operators.dedup import embedding_near_dup_pairs

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_near_dup_pairs(empty, "vec_id", "embedding")
    assert out.count() == 0
    assert set(out.columns) >= {"a", "b"}
