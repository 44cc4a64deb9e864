"""LTR tree-ensemble rescoring (ml inference Tree/Ensemble + QueryRescorer
window semantics) and DSIR importance resampling (Xie et al. 2023)."""
from __future__ import annotations

import collections
import hashlib
import math
import re

import pytest

from elasticsearch_spark.operators import ltr
from elasticsearch_spark.operators.sampling import dsir_resample, dsir_weights

TREE_A = {
    "feature_names": ["f_len", "f_tf"],
    "tree_structure": [
        {"node_index": 0, "split_feature": 0, "threshold": 10.0,
         "left_child": 1, "right_child": 2},
        {"node_index": 1, "leaf_value": 1.0, "left_child": -1},
        {"node_index": 2, "split_feature": 1, "threshold": 2.0,
         "left_child": 3, "right_child": 4, "decision_type": "lt",
         "default_left": False},
        {"node_index": 3, "leaf_value": 2.0, "left_child": -1},
        {"node_index": 4, "leaf_value": 3.0, "left_child": -1},
    ],
}
TREE_B = {
    "feature_names": ["f_len", "f_tf"],
    "tree_structure": [
        {"node_index": 0, "split_feature": 1, "threshold": 0.5,
         "left_child": 1, "right_child": 2},
        {"node_index": 1, "leaf_value": -1.0, "left_child": -1},
        {"node_index": 2, "leaf_value": 0.5, "left_child": -1},
    ],
}


def eval_tree(tree, feats):
    nodes = {n["node_index"]: n for n in tree["tree_structure"]}
    i = 0
    while True:
        n = nodes[i]
        if n.get("left_child", -1) < 0:
            return n["leaf_value"]
        v = feats[tree["feature_names"][n["split_feature"]]]
        if v is None:
            i = n["left_child"] if n.get("default_left", True) else n["right_child"]
        elif (v < n["threshold"]) if n.get("decision_type") == "lt" else (v <= n["threshold"]):
            i = n["left_child"]
        else:
            i = n["right_child"]


@pytest.fixture(scope="module")
def hits(spark):
    rows = [  # (id, base, f_len, f_tf)
        (0, 9.0, 5.0, 0.0), (1, 8.0, 20.0, 3.0), (2, 7.0, 20.0, 1.0),
        (3, 6.0, None, 0.0), (4, 5.0, 12.0, 0.4), (5, 4.0, 30.0, 9.0),
    ]
    return spark.createDataFrame(
        rows, "id long, _score double, f_len double, f_tf double")


def test_tree_routing_matches_reference_semantics(spark, hits):
    got = {r["id"]: r["s"] for r in hits.selectExpr(
        "id", ltr.compile_tree(TREE_A) + " as s").collect()}
    for r in hits.collect():
        want = eval_tree(TREE_A, {"f_len": r["f_len"], "f_tf": r["f_tf"]})
        assert got[r["id"]] == want, r["id"]
    # null f_len routes default_left=True at node 0 → leaf 1.0
    assert got[3] == 1.0
    # lt (not lte) at node 2: f_tf=1.0 < 2.0 → 2.0 ; f_tf=3.0 → 3.0
    assert got[2] == 2.0 and got[1] == 3.0


def test_ensemble_weighted_sum_and_logistic(hits):
    model = {"trained_models": [TREE_A, TREE_B],
             "aggregate_output": {"weighted_sum": {"weights": [2.0, 1.0]}}}
    got = {r["id"]: r["s"] for r in hits.selectExpr(
        "id", ltr.ensemble_sql(model) + " as s").collect()}
    for r in hits.collect():
        f = {"f_len": r["f_len"], "f_tf": r["f_tf"]}
        assert got[r["id"]] == pytest.approx(
            2.0 * eval_tree(TREE_A, f) + eval_tree(TREE_B, f))
    logit = dict(model, aggregate_output={"logistic_regression": {"weights": [2.0, 1.0]}})
    gl = {r["id"]: r["s"] for r in hits.selectExpr(
        "id", ltr.ensemble_sql(logit) + " as s").collect()}
    assert gl[0] == pytest.approx(1 / (1 + math.exp(-got[0])))


def test_rescore_window_semantics(hits):
    model = {"trained_models": [TREE_A],
             "aggregate_output": {"weighted_sum": {}}}
    out = ltr.ltr_rescore(hits, model, id_col="id", window_size=3)
    rows = {r["id"]: r for r in out.collect()}
    # window = base-rank top 3 = ids 0,1,2; model scores 1.0, 3.0, 2.0
    assert [rows[i]["_rescored"] for i in (0, 1, 2)] == [1.0, 3.0, 2.0]
    # window re-sorted by model score, non-window keeps base order AFTER it
    order = [r["id"] for r in sorted(rows.values(), key=lambda r: r["_rank"])]
    assert order == [1, 2, 0, 3, 4, 5]
    # outside-window rows keep their base score
    assert rows[5]["_rescored"] == 4.0


# ---------------------------------------------------------------- DSIR

RAW = [
    (1, "the cat sat on the mat"),
    (2, "stock market prices fell sharply today"),
    (3, "the cat chased the dog"),
    (4, "quarterly earnings report market shares"),
    (5, "cat dog cat dog"),
]
TARGET = [(100, "cat dog pets the cat"), (101, "the dog sat")]


def py_dsir_logw(buckets=64, alpha=0.5):
    """Independent pure-Python mirror of dsir_weights."""
    def grams(text):
        t = re.findall(r"[a-z0-9]+", text.lower())
        return t + [" ".join(t[i:i + 2]) for i in range(len(t) - 1)]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets

    ct, cq = collections.Counter(), collections.Counter()
    for _, t in TARGET:
        ct.update(bucket(g) for g in grams(t))
    for _, t in RAW:
        cq.update(bucket(g) for g in grams(t))
    nt, nq = sum(ct.values()), sum(cq.values())
    out = {}
    for k, t in RAW:
        out[k] = sum(
            math.log((ct[bucket(g)] + alpha) / (nt + alpha * buckets))
            - math.log((cq[bucket(g)] + alpha) / (nq + alpha * buckets))
            for g in grams(t))
    return out


def test_dsir_weights_exact(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = {r["doc_id"]: r["logw"] for r in
           dsir_weights(raw, tgt, "doc_id", "text", buckets=64).collect()}
    want = py_dsir_logw(buckets=64)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
    # pet-like docs outweigh finance docs against a pets target
    assert got[5] > got[2] and got[1] > got[4]


def test_dsir_resample_deterministic(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    tgt = spark.createDataFrame(TARGET, "doc_id long, text string")
    a = [r["doc_id"] for r in
         dsir_resample(raw, tgt, "doc_id", "text", k=3, buckets=64).collect()]
    b = [r["doc_id"] for r in
         dsir_resample(raw, tgt, "doc_id", "text", k=3, buckets=64).collect()]
    assert a == b and len(a) == 3

    # gumbel key mirrors the documented 31-bit MCG uniform
    logw = py_dsir_logw(buckets=64)
    def gkey(k):
        u = ((k % 2147483647) * 2654435761 + 101) % 2147483647
        return logw[k] - math.log(-math.log((u + 1) / 2147483649.0))
    want = [k for k, _ in sorted(
        ((k, gkey(k)) for k, _ in RAW), key=lambda x: (-x[1], x[0]))][:3]
    assert a == want


def test_ltr_rescore_envelope_and_dotted_features(spark):
    """ltr_rescore resolves like its sibling callers: the {"ensemble": ...}
    PUT envelope and registry model ids work, and dotted feature names are
    rewritten to safe placeholders instead of parsing as struct access."""
    tree = {
        "feature_names": ["load.avg"],
        "tree_structure": [
            {"node_index": 0, "split_feature": 0, "threshold": 1.0,
             "left_child": 1, "right_child": 2},
            {"node_index": 1, "leaf_value": 10.0},
            {"node_index": 2, "leaf_value": 20.0},
        ],
    }
    envelope = {"ensemble": {"trained_models": [tree],
                             "aggregate_output": {"weighted_sum": {}}}}
    hits = spark.createDataFrame(
        [(1, 9.0, 0.5), (2, 8.0, 3.0)], "id long, _score double, `load.avg` double")
    out = {r["id"]: r["_rescored"]
           for r in ltr.ltr_rescore(hits, envelope, id_col="id", window_size=2).collect()}
    assert out == {1: 10.0, 2: 20.0}
    ltr.put_trained_model("m-dotted", envelope)
    out2 = {r["id"]: r["_rescored"]
            for r in ltr.ltr_rescore(hits, "m-dotted", id_col="id", window_size=2).collect()}
    assert out2 == out


def test_dsir_resample_string_keys(spark):
    """String document keys (urls) must produce real Gumbel noise — the
    long-cast used to NULL every key and return keys in lexicographic
    order regardless of importance weight."""
    from elasticsearch_spark.operators.sampling import dsir_resample

    raw = spark.createDataFrame(
        [(f"u{i:03d}", "cat dog pets" if i % 2 else "stock market prices")
         for i in range(40)], "url string, text string")
    tgt = spark.createDataFrame(
        [("t1", "cat dog pets the cat"), ("t2", "dog cat pet")],
        "url string, text string")
    out = dsir_resample(raw, tgt, "url", "text", k=10).collect()
    assert len(out) == 10
    assert all(r["gkey"] is not None for r in out)
    # target-like (odd) docs dominate the draw
    assert sum(int(r["url"][1:]) % 2 for r in out) >= 7
    # NOT just the lexicographically-smallest keys
    assert {r["url"] for r in out} != {f"u{i:03d}" for i in range(10)}
