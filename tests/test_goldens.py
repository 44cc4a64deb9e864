"""Stored-golden regression net (the YAML-REST-test analog): rebuild the
tiny corpus from scratch and assert the engine reproduces the frozen
results exactly — pre-merge, post-merge, and the explain breakdown.
Regenerate via tools/gen_goldens.py only on intentional semantic change."""

from __future__ import annotations

import json
import os

import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "search_goldens.json")


@pytest.fixture(scope="module")
def goldens():
    if not os.path.exists(GOLDEN_PATH):
        pytest.skip("goldens not generated (tools/gen_goldens.py)")
    with open(GOLDEN_PATH) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def rebuilt(spark, goldens):
    import tools.gen_goldens as G

    return G.build_goldens()


def test_build_stats_stable(goldens, rebuilt):
    assert rebuilt["build"] == goldens["build"]


def test_pre_merge_results_stable(goldens, rebuilt):
    assert rebuilt["pre_merge"] == goldens["pre_merge"]


def test_post_merge_results_stable(goldens, rebuilt):
    assert rebuilt["post_merge"] == goldens["post_merge"]
    assert rebuilt["post_merge"] == rebuilt["pre_merge"]  # merge invariance


def test_explain_stable(goldens, rebuilt):
    assert rebuilt["explain_q0_top1"] == goldens["explain_q0_top1"]
