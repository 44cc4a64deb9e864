"""Span queries over the positional index — the Lucene span family.

span_term / span_near / span_or / span_first / span_not /
span_containing / span_within / span_multi, parsed from the ES JSON
shapes (``server/src/main/java/org/elasticsearch/index/query/
SpanTermQueryBuilder.java``, ``SpanNearQueryBuilder.java``,
``SpanOrQueryBuilder.java``, ``SpanFirstQueryBuilder.java``,
``SpanNotQueryBuilder.java``, ``SpanContainingQueryBuilder.java``,
``SpanWithinQueryBuilder.java``, ``SpanMultiTermQueryBuilder.java``).

Execution reuses the distributed positional machinery (operators/
phrase.py): one task per segment, postings-with-positions term-filter
pushdown to the parquet scan, span algebra evaluated per candidate doc
INSIDE the segment task (zero shuffle, no driver reads), BM25 scoring of
verified docs, ≤k rows per task to the coordinator merge.

Semantics (documented subset of Lucene spans):
- a span is an inclusive token-position interval ``(start, end)``;
  ``span_term`` yields ``(p, p)`` per occurrence.
- ``span_near(in_order=True)``: clauses strictly in order and
  non-overlapping (next.start > prev.end); per leading interval the
  greedy minimal chain is emitted; match when
  ``width − Σ clause lengths ≤ slop`` (width = last.end − first.start + 1).
- ``span_near(in_order=False)``: minimal covering window over one
  interval per clause (latest-starting per clause inside the window),
  same slop arithmetic — exact for single-term clauses.
- ``span_first``: spans of ``match`` with ``end < end-param`` (Lucene's
  exclusive end ≤ n).
- ``span_not``: spans of ``include`` overlapping no span of ``exclude``
  (overlap window extended by ``pre``/``post``).
- ``span_containing`` keeps ``big`` spans that contain a ``little``
  span; ``span_within`` keeps ``little`` spans inside a ``big`` span.
- ``span_multi``: the wrapped prefix/wildcard/fuzzy/regexp expands
  against the global term dictionary (capped, term order) into span_or.

Scoring: BM25 sum over the node's MATCH-side leaf terms (include branch
for span_not, big for span_containing, little for span_within), global
df stats — the same DfsPhase determinism as the phrase path.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import analysis
from ..functions import bm25
from ..sources import index_store as store
from .phrase import _POS_BITS, _decode_term, _occ_keys
from .topk import CAND_SCHEMA, _term_weights

_MAX_SPANS_PER_DOC = 256  # per-node emission cap (bounds pathological docs)


@dataclass
class SpanNode:
    kind: str  # term|near|or|first|not|containing|within
    term: str | None = None
    clauses: list["SpanNode"] = field(default_factory=list)
    slop: int = 0
    in_order: bool = True
    end: int = 0
    pre: int = 0
    post: int = 0


def parse_span(body: dict, expander=None) -> SpanNode:
    """ES span query JSON → SpanNode tree. ``expander(kind, spec)`` maps a
    span_multi inner multi-term query to a list of concrete terms."""
    (kind, spec), = body.items()
    if kind == "span_term":
        (fld, v), = spec.items()
        return SpanNode("term", term=v["value"] if isinstance(v, dict) else v)
    if kind == "span_near":
        return SpanNode(
            "near",
            clauses=[parse_span(c, expander) for c in spec["clauses"]],
            slop=int(spec.get("slop", 0)),
            in_order=bool(spec.get("in_order", True)),
        )
    if kind == "span_or":
        return SpanNode("or", clauses=[parse_span(c, expander) for c in spec["clauses"]])
    if kind == "span_first":
        return SpanNode(
            "first", clauses=[parse_span(spec["match"], expander)], end=int(spec["end"])
        )
    if kind == "span_not":
        return SpanNode(
            "not",
            clauses=[parse_span(spec["include"], expander),
                     parse_span(spec["exclude"], expander)],
            pre=int(spec.get("pre", spec.get("dist", 0))),
            post=int(spec.get("post", spec.get("dist", 0))),
        )
    if kind == "span_containing":
        return SpanNode("containing", clauses=[parse_span(spec["big"], expander),
                                               parse_span(spec["little"], expander)])
    if kind == "span_within":
        return SpanNode("within", clauses=[parse_span(spec["little"], expander),
                                           parse_span(spec["big"], expander)])
    if kind in ("span_field_masking", "field_masking_span"):
        # SpanFieldMaskingQueryBuilder: present the inner field's spans AS the
        # outer field's so they compose inside span_near. Our index carries one
        # positional field (the body text stream), so the masked inner query
        # evaluates over the same stream — the mask is an identity here.
        return parse_span(spec["query"], expander)
    if kind == "span_gap":
        # SpanNearQueryBuilder.SpanGapQueryBuilder: {"span_gap": {field: N}} —
        # a virtual span of width N inside an in-order span_near.
        (_fld, width), = spec.items()
        return SpanNode("gap", end=int(width))
    if kind == "span_multi":
        (mk, ms), = spec["match"].items()
        if expander is None:
            raise ValueError("span_multi requires a term-dictionary expander")
        terms = expander(mk, ms)
        return SpanNode("or", clauses=[SpanNode("term", term=t) for t in terms])
    raise ValueError(f"unsupported span query: {kind}")


def leaf_terms(node: SpanNode) -> set[str]:
    if node.kind == "term":
        return {node.term}
    out: set[str] = set()
    for c in node.clauses:
        out |= leaf_terms(c)
    return out


def match_terms(node: SpanNode) -> set[str]:
    """Leaf terms of the MATCH-producing branch (what scores)."""
    if node.kind == "term":
        return {node.term}
    if node.kind in ("not", "containing", "within", "first"):
        return match_terms(node.clauses[0])
    out: set[str] = set()
    for c in node.clauses:
        out |= match_terms(c)
    return out


def _cand_docs(node: SpanNode, decoded: dict) -> np.ndarray:
    """Conjunctive-skeleton candidate doc ids for a node (superset of
    matching docs — the cheap prefilter before per-doc evaluation)."""
    if node.kind == "term":
        return decoded[node.term][0] if node.term in decoded else np.zeros(0, dtype=np.int64)
    if node.kind in ("or",):
        parts = [_cand_docs(c, decoded) for c in node.clauses]
        return np.unique(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.int64)
    if node.kind == "gap":
        return np.zeros(0, dtype=np.int64)  # never reached: near skips gaps
    if node.kind in ("near", "containing", "within"):
        cur = None
        for c in node.clauses:
            if c.kind == "gap":
                continue
            ids = np.unique(_cand_docs(c, decoded))
            cur = ids if cur is None else np.intersect1d(cur, ids, assume_unique=True)
            if len(cur) == 0:
                break
        return cur if cur is not None else np.zeros(0, dtype=np.int64)
    # first / not: bounded by the match/include branch
    return _cand_docs(node.clauses[0], decoded)


def _presence_sure_spans(node: SpanNode, decoded: dict) -> np.ndarray:
    """Docs GUARANTEED to match by term presence alone (subset of matches):
    a span_term matches wherever its term occurs; span_or where any child
    is sure; span_not where the include branch is sure and NO exclude-branch
    term occurs. Positional kinds (near/containing/within/first) return
    empty — those docs take the per-doc evaluator. Keeps broad span_or /
    span_term queries vectorized instead of a Python loop per doc."""
    if node.kind == "term":
        return decoded[node.term][0] if node.term in decoded else np.zeros(0, dtype=np.int64)
    if node.kind == "or":
        parts = [_presence_sure_spans(c, decoded) for c in node.clauses]
        parts = [p for p in parts if len(p)]
        return np.unique(np.concatenate(parts)) if parts else np.zeros(0, dtype=np.int64)
    if node.kind == "not":
        sure = _presence_sure_spans(node.clauses[0], decoded)
        if not len(sure):
            return sure
        excl = [decoded[t][0] for t in leaf_terms(node.clauses[1]) if t in decoded]
        if excl:
            sure = np.setdiff1d(sure, np.concatenate(excl), assume_unique=False)
        return sure
    return np.zeros(0, dtype=np.int64)


def _eval_spans(node: SpanNode, pos: dict[str, list[int]]) -> list[tuple[int, int]]:
    """Evaluate the span tree for ONE doc → sorted (start, end) intervals."""
    if node.kind == "term":
        return [(p, p) for p in pos.get(node.term, ())][:_MAX_SPANS_PER_DOC]
    if node.kind == "or":
        out: list[tuple[int, int]] = []
        for c in node.clauses:
            out.extend(_eval_spans(c, pos))
        return sorted(set(out))[:_MAX_SPANS_PER_DOC]
    if node.kind == "first":
        return [iv for iv in _eval_spans(node.clauses[0], pos) if iv[1] < node.end]
    if node.kind == "not":
        inc = _eval_spans(node.clauses[0], pos)
        exc = _eval_spans(node.clauses[1], pos)
        if not exc:
            return inc
        return [
            (s, e) for s, e in inc
            if not any(s2 <= e + node.post and e2 >= s - node.pre for s2, e2 in exc)
        ]
    if node.kind == "containing":
        big = _eval_spans(node.clauses[0], pos)
        little = _eval_spans(node.clauses[1], pos)
        return [(s, e) for s, e in big if any(s <= s2 and e2 <= e for s2, e2 in little)]
    if node.kind == "within":
        little = _eval_spans(node.clauses[0], pos)
        big = _eval_spans(node.clauses[1], pos)
        return [(s, e) for s, e in little if any(s2 <= s and e <= e2 for s2, e2 in big)]
    if node.kind == "near":
        gap_len = sum(c.end for c in node.clauses if c.kind == "gap")
        real = [c for c in node.clauses if c.kind != "gap"]
        if gap_len and not node.in_order:
            raise ValueError("span_gap requires in_order=true (Lucene SpanNearQuery.Builder)")
        ivs = [_eval_spans(c, pos) for c in real]
        if not ivs or any(not x for x in ivs):
            return []
        out = []
        if node.in_order:
            for first in ivs[0]:
                cur = first
                # gap spans contribute their width to the total span length,
                # granting that many free positions under the slop check
                lens = cur[1] - cur[0] + 1 + gap_len
                ok = True
                for lst in ivs[1:]:
                    nxt = next((iv for iv in lst if iv[0] > cur[1]), None)
                    if nxt is None:
                        ok = False
                        break
                    lens += nxt[1] - nxt[0] + 1
                    cur = nxt
                if ok:
                    width = cur[1] - first[0] + 1
                    # lower bound: the virtual gap spans must fit between the
                    # real spans (width >= lens); upper bound: slop
                    if 0 <= width - lens <= node.slop:
                        out.append((first[0], cur[1]))
        else:
            events = sorted(
                (iv[0], iv[1], ci) for ci, lst in enumerate(ivs) for iv in lst
            )
            n = len(node.clauses)
            for lo in range(len(events)):
                chosen: dict[int, tuple[int, int]] = {}
                for hi in range(lo, len(events)):
                    s, e, ci = events[hi]
                    chosen[ci] = (s, e)  # latest-starting per clause
                    if len(chosen) == n:
                        width = max(v[1] for v in chosen.values()) - events[lo][0] + 1
                        lens = sum(v[1] - v[0] + 1 for v in chosen.values())
                        if width - lens <= node.slop:
                            out.append((events[lo][0], max(v[1] for v in chosen.values())))
                        break
        return sorted(set(out))[:_MAX_SPANS_PER_DOC]
    raise ValueError(node.kind)


def _segment_span_scorer(index_dir: str, node: SpanNode,
                         weights: dict[str, tuple[float, int]],
                         avgdl: float, k1: float, b: float, k: int):
    """mapInPandas fn over a seg-id frame: decode leaf-term postings with
    positions, prefilter candidates by the conjunctive skeleton, evaluate
    the span tree per candidate doc, BM25-score verified docs."""
    import pyarrow.parquet as pq

    from ..functions.smallfloat import byte4_to_int

    fetch_terms = sorted(leaf_terms(node))
    score_terms = sorted(match_terms(node))

    def fn(batches):
        from .ops import seg_tombstones

        for pdf in batches:
            outs = []
            for seg in pdf["seg"]:
                d = store.seg_dir(index_dir, int(seg))
                tomb = seg_tombstones(index_dir, d)
                post = pq.read_table(
                    os.path.join(d, "postings.parquet"),
                    columns=["term", "first_doc_id", "ids_bytes", "tf_bytes", "pos_bytes"],
                    filters=[("term", "in", fetch_terms)],
                ).to_pandas()
                if len(post) == 0:
                    continue
                decoded = {t: _decode_term(post[post["term"] == t]) for t in set(post["term"])}
                cand = np.unique(_cand_docs(node, decoded))
                if len(tomb) and len(cand):
                    p = np.searchsorted(tomb, cand)
                    dead = (p < len(tomb)) & (tomb[np.minimum(p, len(tomb) - 1)] == cand)
                    cand = cand[~dead]
                if len(cand) == 0:
                    continue

                # per-doc position lists: occurrence keys sliced per dense doc
                per_term_pos: dict[str, tuple[np.ndarray, np.ndarray]] = {}
                for t in decoded:
                    keys = _occ_keys(*decoded[t], cand)
                    per_term_pos[t] = (keys >> _POS_BITS, keys & ((1 << _POS_BITS) - 1))
                # presence-decidable docs skip the per-doc span evaluator
                sure = np.intersect1d(
                    _presence_sure_spans(node, decoded), cand, assume_unique=True
                )
                sure_mask = np.zeros(len(cand), dtype=bool)
                sure_mask[np.searchsorted(cand, sure)] = True
                verified = list(sure)
                for dense in np.nonzero(~sure_mask)[0]:
                    pos = {}
                    for t, (dd, pp) in per_term_pos.items():
                        lo = np.searchsorted(dd, dense)
                        hi = np.searchsorted(dd, dense, side="right")
                        if hi > lo:
                            pos[t] = pp[lo:hi].tolist()
                    if pos and _eval_spans(node, pos):
                        verified.append(cand[dense])
                verified.sort()
                if not verified:
                    continue
                verified = np.array(verified, dtype=np.int64)

                docs_t = pq.read_table(
                    os.path.join(d, "docs.parquet"), columns=["doc_id", "norm"]
                )
                nd = docs_t["doc_id"].to_numpy()
                order = np.argsort(nd, kind="mergesort")
                nd = nd[order]
                nq = byte4_to_int(docs_t["norm"].to_numpy())[order]
                ql = nq[np.searchsorted(nd, verified)].astype(np.float64)
                scores = np.zeros(len(verified), dtype=np.float64)
                for t in score_terms:
                    if t not in decoded or t not in weights:
                        continue
                    ids, tfs = decoded[t][0], decoded[t][1]
                    p = np.searchsorted(ids, verified)
                    ok = (p < len(ids)) & (ids[np.minimum(p, len(ids) - 1)] == verified)
                    tf_v = np.where(ok, tfs[np.minimum(p, len(ids) - 1)], 0).astype(np.float64)
                    scores += weights[t][0] * bm25.tf_norm(tf_v, ql, avgdl, k1, b)
                idx = np.lexsort((verified, -scores))[:k]
                outs.append(pd.DataFrame({
                    "doc_id": verified[idx],
                    "score": scores[idx],
                    "n_terms_matched": np.full(len(idx), len(score_terms), dtype=np.int32),
                }))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    return fn


def dict_expander(spark: SparkSession, index_dir: str, max_expansions: int = 50):
    """Multi-term → concrete terms via the global term dictionary (term
    order, capped — the reference's rewrite cap)."""
    def expand(kind: str, spec) -> list[str]:
        terms = spark.read.parquet(store.term_stats_path(index_dir)).select("term")
        if kind == "prefix":
            v = spec["value"] if isinstance(spec, dict) else spec
            cond = F.col("term").startswith(v)
        elif kind == "wildcard":
            v = spec["value"] if isinstance(spec, dict) else spec
            rx = "^" + v.replace(".", "\\.").replace("*", ".*").replace("?", ".") + "$"
            cond = F.col("term").rlike(rx)
        elif kind == "fuzzy":
            v = spec["value"] if isinstance(spec, dict) else spec
            fz = spec.get("fuzziness", 2) if isinstance(spec, dict) else 2
            cond = F.levenshtein("term", F.lit(v)) <= int(fz)
        elif kind == "regexp":
            v = spec["value"] if isinstance(spec, dict) else spec
            cond = F.col("term").rlike("^" + v + "$")
        else:
            raise ValueError(f"span_multi cannot wrap: {kind}")
        return [r["term"] for r in terms.where(cond).orderBy("term").limit(max_expansions).collect()]

    def expand_field(kind: str, ms) -> list[str]:
        # ES shape: {prefix: {field: {value: ...}}} — unwrap the field level
        if isinstance(ms, dict) and len(ms) == 1 and isinstance(next(iter(ms.values())), (dict, str)):
            (fld, spec), = ms.items()
            return expand(kind, spec)
        return expand(kind, ms)

    return expand_field


def search_spans(spark: SparkSession, index_dir: str, span_body: dict, k: int = 10) -> DataFrame:
    """Distributed span query → (doc_id, url, score) top-k."""
    meta = store.IndexMeta.load(index_dir)
    node = parse_span(span_body, dict_expander(spark, index_dir))
    terms = sorted(leaf_terms(node))
    empty = spark.createDataFrame([], "doc_id long, url string, score double")
    if not terms:
        return empty
    weights = _term_weights(spark, index_dir, terms, meta)
    segs = store.list_segs(index_dir)
    if not segs:
        return empty
    fn = _segment_span_scorer(index_dir, node, weights, meta.avgdl, meta.k1, meta.b, k)
    n_tasks = max(1, min(len(segs), spark.sparkContext.defaultParallelism))
    seg_rdd = spark.sparkContext.parallelize([(int(s),) for s in segs], n_tasks)
    cands = spark.createDataFrame(seg_rdd, "seg int").mapInPandas(fn, CAND_SCHEMA)
    top = cands.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    docs = spark.read.parquet(*store.docs_glob(index_dir)).select("doc_id", "url")
    return (
        docs.join(F.broadcast(top), "doc_id")
        .select("doc_id", "url", "score")
        .orderBy(F.desc("score"), F.asc("doc_id"))
    )
