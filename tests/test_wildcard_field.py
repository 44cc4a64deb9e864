"""Wildcard field mapper (x-pack/plugin/wildcard, WildcardFieldMapper.java):
3-gram approximation + exact verification. The invariant under test: the
accelerated two-phase search returns exactly the rows the plain LIKE scan
returns, for anchored/unanchored/`?`/non-accelerable patterns alike."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.operators.wildcard_field import (
    build_wildcard_index,
    like_pattern,
    pattern_fragments,
    probe_grams,
    verify_predicate,
    wildcard_field_search,
)

VALUES = [
    (1, "ERROR critical path /var/log/app.log"),
    (2, "warn slow request path=/api/v1"),
    (3, "error minor hiccup"),
    (4, "Critical ERROR in pipeline"),
    (5, "all quiet"),
    (6, "path_with_underscore and 100% done"),
    (7, "abc"),
    (8, ""),
]


@pytest.fixture(scope="module")
def wc(spark, tmp_path_factory):
    df = spark.createDataFrame(VALUES, "id long, msg string")
    idx = str(tmp_path_factory.mktemp("wcidx") / "grams")
    build_wildcard_index(df, "id", "msg", idx, num_files=2)
    return df, idx


def _expected(df, pattern):
    return sorted(r.id for r in df.where(verify_predicate("msg", pattern)).collect())


@pytest.mark.parametrize(
    "pattern",
    [
        "*error*critical*",   # ordered fragments — approximation overmatches id 4, verify drops it
        "*critical*error*",   # reverse order
        "error*",             # anchored start
        "*app.log",           # anchored end
        "*path*",             # substring
        "err?r*",             # ? inside a fragment
        "*quiet",
        "abc",                # exact, fragment uses sentinels
        "*zzz*",              # no hits
        "a?c",                # no fragment >= 3 chars -> verify-only fallback
        "*100\\%*",           # literal % via like escape? pattern chars are literal here
    ],
)
def test_matches_plain_like(spark, wc, pattern):
    df, idx = wc
    got = sorted(
        r.id for r in wildcard_field_search(spark, idx, df, "id", "msg", pattern).collect()
    )
    assert got == _expected(df, pattern)


def test_order_matters_vs_gram_bag(spark, wc):
    # ids 1 and 4 both contain {error, critical} grams; only the LIKE order survives
    df, idx = wc
    got = sorted(
        r.id for r in wildcard_field_search(spark, idx, df, "id", "msg", "*error*critical*").collect()
    )
    assert got == [1]
    got2 = sorted(
        r.id for r in wildcard_field_search(spark, idx, df, "id", "msg", "*critical*error*").collect()
    )
    assert got2 == [4]


def test_case_insensitive(spark, wc):
    df, idx = wc
    got = sorted(
        r.id for r in wildcard_field_search(spark, idx, df, "id", "msg", "*ERROR*").collect()
    )
    assert got == [1, 3, 4]


def test_fragments_and_grams():
    frags = pattern_fragments("*error*Critical?path*")
    assert frags == ["\x00", "error", "critical", "path", "\x00\x00"]
    grams = probe_grams("*error*")
    assert set(grams) == {"err", "rro", "ror"}
    # anchored start folds the sentinel into the first gram
    assert "\x00er" in probe_grams("error*")
    # anchored end folds both end sentinels in
    assert "g\x00\x00" in probe_grams("*log")
    # "a?b" anchors b to the end sentinels ("b\x00\x00" is a full gram)
    assert probe_grams("a?b") == ["b\x00\x00"]
    assert probe_grams("a?b*") == []  # nothing >= NGRAM_SIZE


def test_like_pattern_escaping():
    assert like_pattern("a*b?c") == "a%b_c"
    assert like_pattern("100%_x\\") == "100\\%\\_x\\\\"


def test_probe_cap():
    long_frag = "abcdefghijklmnopqrstuvwxyz0123456789" * 3
    assert len(probe_grams(f"*{long_frag}*")) <= 32


def test_gram_probe_prunes_scan(spark, wc):
    # the phase-1 read must carry a pushed gram filter, not scan all rows
    df, idx = wc
    plan = (
        spark.read.parquet(idx)
        .where(F.col("gram").isin(probe_grams("*error*")))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [In(gram" in plan
