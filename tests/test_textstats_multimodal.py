"""Text-analysis functions + multimodal plumbing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.functions import textstats
from elasticsearch_spark.operators import multimodal


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (1, "The cat and the dog ran to the house with you, and that is that."),
        (2, "Der Hund und die Katze sind nicht mit der Maus, und das ist ein Haus."),
        (3, "Le chat et le chien est une bête, et que la maison est pour les amis."),
        (4, "中文文本处理是一个很好的例子，中文没有空格。"),
        (5, "xk qz vw 123 999 $$$"),
        (6, "word " * 100),
    ]
    return spark.createDataFrame(rows, "id long, text string").cache()


def test_lang_id(spark, texts):
    got = {r["id"]: r["lang"] for r in texts.select("id", textstats.lang_id("text").alias("lang")).collect()}
    assert got[1] == "en" and got[2] == "de" and got[3] == "fr" and got[4] == "zh"
    assert got[5] == "unk"


def test_token_counts(spark, texts):
    row = texts.where(F.col("id") == 1).select(
        textstats.token_count("text").alias("n"),
        textstats.bpe_ish_token_count("text").alias("bpe"),
    ).collect()[0]
    assert row["n"] == 15
    assert row["bpe"] > row["n"]  # punctuation counted as subword pieces


def test_quality_score_ordering(spark, texts):
    got = {r["id"]: r["quality"] for r in texts.select("id", textstats.quality_score("text")).collect()}
    assert got[1] > got[5]  # natural English beats gibberish
    assert got[1] > got[6]  # repetition (low TTR) penalized


def test_rolling_fingerprint_edit_robust(spark):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    edited = base.replace("kappa", "kappa2", 1)  # one token changed
    df = spark.createDataFrame([(1, base), (2, edited)], "id long, text string")
    fps = {r["id"]: r["fingerprint"] for r in df.select("id", textstats.rolling_fingerprint("text")).collect()}
    assert fps[1] == fps[2]  # min shingle unaffected by a single edit


def test_annotate_one_pass(spark, texts):
    out = textstats.annotate(texts)
    assert {"lang_pred", "n_tokens", "n_subwords", "quality", "fingerprint"} <= set(out.columns)
    assert out.count() == 6


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", b"\x89PNG\r\n\x1a\n" + b"\x00" * 100, (64, 48, None, None, "png")),
        (2, "image", b"\xff\xd8\xff\xe0" + bytes(range(256)), (32, 32, None, None, "jpeg")),
        (3, "video", b"\x1aE\xdf\xa3" + b"\x01" * 50, (640, 480, None, 95, "vp9")),
        (4, "audio", b"OggS" + b"\x02" * 80, (None, None, 44100, None, "opus")),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_byte_features(spark, media):
    got = {r["media_id"]: r for r in multimodal.byte_features(media).collect()}
    assert got[1]["sniffed"] == "png" and got[2]["sniffed"] == "jpeg"
    assert got[3]["sniffed"] == "matroska" and got[4]["sniffed"] == "ogg"
    assert got[1]["entropy"] < got[2]["entropy"]  # zeros vs uniform bytes
    assert got[2]["entropy"] == pytest.approx(4.0, abs=0.01)  # 16 uniform bins
    assert len(got[1]["hist"]) == 16
    # deterministic content hash
    again = {r["media_id"]: r["content_hash"] for r in multimodal.byte_features(media).collect()}
    assert all(got[k]["content_hash"] == again[k] for k in got)


def test_decode_stub_raises_without_codec(spark, media):
    if multimodal._HAS_PIL:
        pytest.skip("codec present")
    with pytest.raises(Exception) as ei:
        multimodal.decode_image_features(media.where(F.col("kind") == "image")).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_decode_fake_pipeline(spark, media):
    out = multimodal.decode_image_features(media.where(F.col("kind") == "image"), fake=True).collect()
    assert len(out) == 2
    assert all(len(r["thumb"]) == 64 for r in out)


def test_frame_sampling_plan(spark, media):
    frames = multimodal.sample_frames(media.where(F.col("kind") == "video"), every_n=10, fake=True).collect()
    assert [r["frame_idx"] for r in frames] == list(range(0, 95, 10))


def test_nb_classifier_exact_math_and_oov(spark):
    import math

    from pyspark.sql import functions as F

    from elasticsearch_spark.operators.classifier import score_tokens, train_nb

    rows = [
        (1, ["good", "good", "fine"], 1),
        (2, ["good", "nice"], 1),
        (3, ["bad", "awful"], 0),
        (4, ["bad", "bad", "fine"], 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, toks array<string>, y int")
    weights, prior, oov = train_nb(df, "toks", "y", add_k=0.5)
    w = {r["token"]: r["w"] for r in weights.collect()}
    # hand-computed: tp=5 (pos token occurrences), tn=5, V=5, kV=2.5
    tp, tn, kv, k = 5.0, 5.0, 2.5, 0.5
    exp_good = math.log((3 + k) / (tp + kv)) - math.log((0 + k) / (tn + kv))
    exp_bad = math.log((0 + k) / (tp + kv)) - math.log((3 + k) / (tn + kv))
    exp_fine = math.log((1 + k) / (tp + kv)) - math.log((1 + k) / (tn + kv))
    assert abs(w["good"] - exp_good) < 1e-12
    assert abs(w["bad"] - exp_bad) < 1e-12
    assert abs(w["fine"] - exp_fine) < 1e-12
    assert prior == 0.0  # 2 vs 2 docs
    assert abs(oov - (math.log(k / (tp + kv)) - math.log(k / (tn + kv)))) < 1e-12
    assert oov == 0.0  # symmetric masses
    # scoring: doc with in-vocab + OOV token; empty-token doc gets prior
    sc = spark.createDataFrame(
        [(10, ["good", "zzz"]), (11, [])],
        "doc_id long, toks array<string>",
    )
    out = {r["doc_id"]: r["score"] for r in
           score_tokens(sc, "doc_id", "toks", weights, prior, oov).collect()}
    assert abs(out[10] - (prior + exp_good + oov)) < 1e-12
    assert out[11] == prior
    # both-classes guard
    import pytest as _pt
    with _pt.raises(ValueError):
        train_nb(df.where(F.col("y") == 1), "toks", "y")


def test_bpe_train_apply_classic_example(spark):
    """Sennrich et al.'s running example: corpus of low/lower/newest/widest
    — the first merges fuse the frequent 'es', 'est', 'est</w>' suffix."""
    from elasticsearch_spark.operators.bpe import (
        bpe_encode, bpe_token_count, encode_word, train_bpe)

    rows = (
        [(i, "low") for i in range(5)]
        + [(100 + i, "lower") for i in range(2)]
        + [(200 + i, "newest") for i in range(6)]
        + [(300 + i, "widest") for i in range(3)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe(df, "text", n_merges=10)
    assert merges[0] == ("e", "s")          # freq 9 (newest+widest)
    assert merges[1] == ("es", "t")         # freq 9
    assert merges[2] == ("est", "</w>")     # freq 9
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    # with only the first 3 merges, 'newest' ends in the fused est</w> piece
    enc3 = encode_word("newest", {tuple(m): i for i, m in enumerate(merges[:3])})
    assert enc3 == ["n", "e", "w", "est</w>"]
    # with all 10 merges this tiny corpus fully fuses the frequent words
    enc = encode_word("newest", ranks)
    assert "".join(enc) == "newest</w>"
    # unseen word with no applicable merges falls back to chars + marker
    assert encode_word("xyz", ranks) == ["x", "y", "z", "</w>"]
    # distributed apply agrees with the driver-side encoder
    out = {r["doc_id"]: r["pieces"] for r in
           bpe_encode(df.limit(50), "doc_id", "text", merges).collect()}
    assert out[200] == encode_word("newest", ranks)
    cnt = {r["doc_id"]: r.asDict() for r in
           bpe_token_count(df, "doc_id", "text", merges).collect()}
    assert cnt[200]["n_words"] == 1
    assert cnt[200]["n_bpe_tokens"] == len(encode_word("newest", ranks))
    # empty doc scores 0 / 0
    df2 = spark.createDataFrame([(1, "")], "doc_id long, text string")
    c2 = bpe_token_count(df2, "doc_id", "text", merges).first()
    assert (c2["n_words"], c2["n_bpe_tokens"]) == (0, 0)


def test_bpe_multiword_order_preserved(spark):
    from elasticsearch_spark.operators.bpe import bpe_encode, encode_word, train_bpe

    df = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the cat sat on the mat"), (3, "cat the")] * 3,
        "doc_id long, text string",
    )
    merges = train_bpe(df, "text", n_merges=20)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = {r["doc_id"]: r["pieces"] for r in
           bpe_encode(df.dropDuplicates(["doc_id"]), "doc_id", "text", merges).collect()}
    want1 = (encode_word("the", ranks) + encode_word("cat", ranks)
             + encode_word("sat", ranks))
    assert got[1] == want1
    assert got[3] == encode_word("cat", ranks) + encode_word("the", ranks)


def test_byte_features_null_payload(spark):
    """A NULL payload is a corrupt-sample row, not a stage killer."""
    df = spark.createDataFrame(
        [(1, bytearray(b"RIFFxxxx")), (2, None)], "media_id long, payload binary")
    got = {r["media_id"]: r for r in multimodal.byte_features(df).collect()}
    assert got[2]["size"] == 0 and got[2]["sniffed"] == "unknown"
    assert got[1]["sniffed"] == "riff"
