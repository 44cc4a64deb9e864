"""Generate the stored golden corpus (the YAML-REST-test analog,
SURVEY.md §5): tiny deterministic pages table → engine results for a fixed
query set, frozen to tests/goldens/search_goldens.json. The paired test
(tests/test_goldens.py) replays and asserts byte-equality — a regression
net that catches ANY behavior drift in analyzer, codec, scoring, or merge,
independent of the live oracles.

Regenerate ONLY on intentional semantic change: python tools/gen_goldens.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "goldens", "search_goldens.json",
)
N_PAGES = 200
INDEX_DIR = "/tmp/es_golden_index"

QUERIES = [
    {"kind": "or", "terms": ["the", "w00123", "w02000"]},
    {"kind": "or", "terms": ["the", "of", "and"]},
    {"kind": "and", "terms": ["w00010", "w00050"]},
    {"kind": "and", "terms": ["the", "a", "w00001"]},
    {"kind": "or", "terms": ["w04000", "w00200"]},
    {"kind": "msm2", "terms": ["w00005", "w00020", "w00100", "zzmissing"]},
]


def build_goldens() -> dict:
    from elasticsearch_spark.operators.merge import merge_index
    from elasticsearch_spark.operators.postings import build_index
    from elasticsearch_spark.operators.suggest import explain
    from elasticsearch_spark.operators.topk import search_topk
    from elasticsearch_spark.session import get_spark
    from elasticsearch_spark.sources.pages import pages_df

    spark = get_spark(app_name="goldens", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(INDEX_DIR, ignore_errors=True)
    info = build_index(spark, pages_df(spark, N_PAGES, n_parts=4), INDEX_DIR, num_partitions=5)

    def run_all(tag: str) -> dict:
        out = {}
        for i, q in enumerate(QUERIES):
            op = "and" if q["kind"] == "and" else "or"
            msm = 2 if q["kind"] == "msm2" else None
            hits = search_topk(
                spark, INDEX_DIR, q["terms"], k=10, operator=op,
                minimum_should_match=msm, mode="wand", fetch=True,
            ).collect()
            out[f"q{i}"] = [
                {"url": r["url"], "score": round(r["score"], 9)} for r in hits
            ]
        return out

    goldens = {
        "n_pages": N_PAGES,
        "build": {"doc_count": info["doc_count"], "sum_dl": info["sum_dl"], "n_blocks": info["n_blocks"]},
        "pre_merge": run_all("pre"),
    }
    merge_index(spark, INDEX_DIR, segments_per_tier=3, floor_bytes=1)
    goldens["post_merge"] = run_all("post")
    ex = explain(spark, INDEX_DIR, ["the", "w00123"], goldens["pre_merge"]["q0"][0]["url"]).collect()
    goldens["explain_q0_top1"] = [
        {"term": r["term"], "tf": r["tf"], "df": r["df"], "contribution": round(r["contribution"], 9)}
        for r in sorted(ex, key=lambda r: r["term"])
    ]
    return goldens


if __name__ == "__main__":
    g = build_goldens()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with open(GOLDEN_PATH, "w") as f:
        json.dump(g, f, indent=1, sort_keys=True)
    print(f"wrote {GOLDEN_PATH}: {sum(len(v) for v in g['pre_merge'].values())} pre-merge hits")
