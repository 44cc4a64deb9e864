"""Index-administration API parity: shrink/split/clone (re-routed rebuilds
at a new partition count), open/close/add_block enforcement, resolve_index,
search_shards, simulate_index_template, painless execute, _source variants,
grok pattern bank, put/get mapping with additive-only merges."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.api import Engine
from elasticsearch_spark.sources import index_store as store

ROOT = "/tmp/es_spark_admin_test"


@pytest.fixture(scope="module")
def es(spark):
    shutil.rmtree(ROOT, ignore_errors=True)
    eng = Engine(spark, root=ROOT)
    eng.create_index("src", num_partitions=4)
    docs = spark.createDataFrame(
        [(f"u{i}", f"doc number {i} spark text", "en") for i in range(20)],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
    eng.bulk("src", docs)
    return eng


def test_shrink_validates_and_rebuilds(es):
    with pytest.raises(ValueError, match="must divide"):
        es.shrink_index("src", "bad", 3)
    out = es.shrink_index("src", "small", 2)
    assert out["acknowledged"]
    assert es.count("small") == 20
    assert store.IndexMeta.load(es._dir("small")).num_partitions == 2


def test_split_and_clone(es):
    with pytest.raises(ValueError, match="multiple"):
        es.split_index("src", "bad", 6)
    es.split_index("src", "big", 8)
    assert es.count("big") == 20
    assert store.IndexMeta.load(es._dir("big")).num_partitions == 8
    es.clone_index("src", "copy")
    assert es.count("copy") == 20
    with pytest.raises(ValueError, match="already exists"):
        es.clone_index("src", "copy")


def test_blocks_enforced(es, spark):
    es.add_block("src", "write")
    extra = spark.createDataFrame(
        [("u99", "late doc", "en")], "url string, text string, lang string"
    ).withColumn("warc_ts", F.lit("2024-01-02").cast("timestamp"))
    with pytest.raises(ValueError, match="blocked for write"):
        es.bulk("src", extra)
    # reads still fine under a write-only block
    assert es.count("src") == 20
    es.close_index("src")
    with pytest.raises(ValueError, match="blocked for read"):
        es.search("src", {"query": {"match_all": {}}})
    es.open_index("src")
    assert es.search("src", {"query": {"term": {"lang": "en"}}, "size": 1})
    with pytest.raises(ValueError, match="unsupported block"):
        es.add_block("src", "metadata")


def test_resolve_and_search_shards(es):
    es.update_aliases([{"add": {"alias": "all-src", "index": "src"}}])
    r = es.resolve_index("all-src")
    assert r["indices"] == ["src"] and r["aliases"] == ["all-src"]
    sh = es.search_shards("src")
    assert sh["src"]["num_partitions"] == 4
    assert sh["src"]["segments"] >= 1


def test_simulate_template(es):
    es.put_index_template("t-sim", ["sim-*"], settings={"num_partitions": 9})
    sim = es.simulate_index_template("sim-0001")
    assert sim["template"]["settings"]["num_partitions"] == 9
    assert es.simulate_index_template("nomatch-x")["template"] is None


def test_painless_execute(es):
    out = es.scripts_painless_execute(
        {"source": "a * b + 1", "params": None}, {"a": 6, "b": 7}
    )
    assert out["result"] == 43
    assert es.scripts_painless_execute("1 + 1")["result"] == 2


def test_source_variants(es):
    src = es.get_source("src", "u3")
    assert src["text"].startswith("doc number 3")
    assert "_score" not in src
    assert es.exists_source("src", "u3") is True
    assert es.exists_source("src", "nope") is False


def test_grok_pattern_bank(es):
    bank = es.grok_patterns()
    assert "IP" in bank and "GREEDYDATA" in bank


def test_mappings_additive_only(es):
    es.put_mapping("src", {"properties": {"price": {"type": "double"}}})
    es.put_mapping("src", {"properties": {"tag": {"type": "keyword"}}})
    m = es.get_mapping("src")
    assert m["properties"]["price"]["type"] == "double"
    assert m["properties"]["tag"]["type"] == "keyword"
    with pytest.raises(ValueError, match="cannot change type"):
        es.put_mapping("src", {"properties": {"price": {"type": "keyword"}}})


def test_mount_searchable_snapshot(es, spark, tmp_path):
    repo = str(tmp_path / "repo")
    es.snapshot("src", repo, "snap1")
    out = es.mount_snapshot(repo, "snap1", "src", renamed_index="mounted")
    assert out["zero_copy"] and out["mounted"] == "mounted"
    assert es.count("mounted") == 20
    res = es.search("mounted", {"query": {"match": {"text": "spark"}}, "size": 3})
    assert len(res["hits"].collect()) == 3
    extra = spark.createDataFrame(
        [("w1", "nope", "en")], "url string, text string, lang string"
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
    with pytest.raises(ValueError, match="blocked for write"):
        es.bulk("mounted", extra)
    with pytest.raises(ValueError, match="already exists"):
        es.mount_snapshot(repo, "snap1", "src", renamed_index="mounted")
    with pytest.raises(ValueError, match="no snapshot"):
        es.mount_snapshot(repo, "nosnap", "src")
    # unmount removes only the link; the repository copy survives
    import os
    es.delete_index("mounted")
    assert "mounted" not in es.indices()
    assert os.path.isdir(os.path.join(repo, "snap1", "src"))


def test_search_mvt(es, spark):
    import math
    docs = spark.createDataFrame(
        [(f"g{i}", f"point {i}", "en", float(i), float(i)) for i in range(-3, 4)],
        "url string, text string, lang string, lat double, lon double",
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp")) \
     .withColumn("loc", F.struct("lat", "lon")).drop("lat", "lon")
    es.create_index("geo", num_partitions=2)
    es.bulk("geo", docs)
    # zoom 1 tile (1,1) covers lon [0,180) x lat (-85.05, 0]: only (0,0)
    grid = es.search_mvt("geo", "loc", 1, 1, 1).collect()
    assert sum(r["doc_count"] for r in grid) == 1
    grid2 = es.search_mvt("geo", "loc", 0, 0, 0).collect()
    assert sum(r["doc_count"] for r in grid2) == 7  # whole world tile
    # every grid key is at the sub-grid zoom (0 + grid_precision 8)
    assert all(r["key"].startswith("8/") for r in grid2)
    assert all(r["key"].startswith("9/") for r in grid)  # 1 + 8


def test_tasks_and_cluster_stats(es):
    res = es.async_search_submit("src", {"query": {"match_all": {}}, "size": 2})
    sid = res["id"]
    tasks = es.tasks_list()["tasks"]
    assert sid in tasks and tasks[sid]["action"].endswith("async_search")
    es.async_search_get(sid, wait_seconds=30)
    assert es.tasks_list()["tasks"][sid]["running"] is False
    with pytest.raises(KeyError):
        es.tasks_cancel("nope")
    cs = es.cluster_stats()
    assert cs["indices"]["count"] >= 1
    assert cs["indices"]["docs"]["count"] >= 20


def test_settings_get_put(spark, tmp_path):
    import shutil as _sh

    from elasticsearch_spark.api import Engine
    from elasticsearch_spark.sources.pages import pages_df

    root = str(tmp_path / "settings_eng")
    _sh.rmtree(root, ignore_errors=True)
    es = Engine(spark, root=root)
    es.create_index("pages", num_partitions=2)
    es.bulk("pages", pages_df(spark, 60, n_parts=2))
    got = es.get_settings("pages")["pages"]["settings"]["index"]
    assert got["num_partitions"] == 2
    assert got["similarity"]["default"]["k1"] == 1.2
    # dynamic update: block writes, tune similarity, stash a free-form key
    es.put_settings("pages", {"index": {
        "blocks": {"write": True},
        "similarity": {"default": {"k1": 0.9}},
        "refresh_interval": "30s",
    }})
    got = es.get_settings("pages")["pages"]["settings"]["index"]
    assert got["blocks"] == {"write": True}
    assert got["similarity"]["default"]["k1"] == 0.9
    assert got["refresh_interval"] == "30s"
    import pytest as _pytest

    batch = pages_df(spark, 10, n_parts=1).drop("html")
    with _pytest.raises(Exception):
        es.bulk("pages", batch)
    # unblock → writes flow again
    es.put_settings("pages", {"index": {"blocks": {"write": False}}})
    es.bulk("pages", batch)


def test_disk_usage(spark, tmp_path):
    import shutil as _sh

    from elasticsearch_spark.api import Engine
    from elasticsearch_spark.sources.pages import pages_df

    root = str(tmp_path / "du_eng")
    _sh.rmtree(root, ignore_errors=True)
    es = Engine(spark, root=root)
    es.create_index("pages", num_partitions=2)
    es.bulk("pages", pages_df(spark, 80, n_parts=2))
    du = es.disk_usage("pages")["pages"]
    assert du["store_size_in_bytes"] > 0
    fields = du["fields"]
    # postings columns are inverted-index bytes; docs text is stored fields
    assert fields["term"]["inverted_index_in_bytes"] > 0
    assert fields["text"]["stored_fields_in_bytes"] > 0
    assert sum(f["total_in_bytes"] for f in fields.values()) <= du["store_size_in_bytes"]


def test_settings_review_fixes(spark, tmp_path):
    import shutil as _sh

    import pytest as _pytest

    from elasticsearch_spark.api import Engine
    from elasticsearch_spark.sources.pages import pages_df

    root = str(tmp_path / "settings_rv")
    _sh.rmtree(root, ignore_errors=True)
    es = Engine(spark, root=root)
    es.create_index("pages", num_partitions=2)
    es.bulk("pages", pages_df(spark, 40, n_parts=2))
    # a verbatim bag key can never shadow the live structural value
    es.put_settings("pages", {"index": {"analyzer": "whitespace_fake"}})
    got = es.get_settings("pages")["pages"]["settings"]["index"]
    assert got["analyzer"] == "standard"
    # removing an unknown block is rejected like adding one
    with _pytest.raises(ValueError):
        es.put_settings("pages", {"index": {"blocks": {"bogus": False}}})
    # _source: true is the full-source no-op; bare-string form keeps the field
    r1 = es.search("pages", {"query": {"match_all": {}}, "_source": True, "size": 1})
    assert "text" in r1["hits"].columns
    r2 = es.search("pages", {"query": {"term": {"lang": "en"}}, "_source": "lang", "size": 1})
    assert "lang" in r2["hits"].columns and "text" not in r2["hits"].columns
    # suggest + _source survive the multi-index early return / are validated
    es.create_index("pages2", num_partitions=2)
    es.bulk("pages2", pages_df(spark, 20, n_parts=2).drop("html"))
    multi = es.search("pages,pages2", {"query": {"match_all": {}}, "_source": False, "size": 3})
    assert "text" not in multi["hits"].columns
    with _pytest.raises(ValueError):
        es.search("pages,pages2", {"query": {"match_all": {}},
                                   "suggest": {"s": {"text": "x", "term": {}}}})
    with _pytest.raises(ValueError):
        es.search("pages", {"suggest": {"s": {"term": {}, "phrase": {}, "text": "x"}}})
    with _pytest.raises(ValueError):
        es.search("pages", {"suggest": {"s": {"term": {}}}})  # no text anywhere


def test_external_version_validation(spark, tmp_path):
    import shutil as _sh

    import pytest as _pytest
    from pyspark.sql import functions as F

    from elasticsearch_spark.api import Engine

    root = str(tmp_path / "ver_rv")
    _sh.rmtree(root, ignore_errors=True)
    es = Engine(spark, root=root)
    es.create_index("pages", num_partitions=2)
    nover = spark.createDataFrame([("u1", "t", "en")], "url string, text string, lang string") \
        .withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
    es.bulk("pages", nover)
    # external versioning without a version column is rejected, not silent
    with _pytest.raises(ValueError):
        es.bulk("pages", nover, version_type="external")


def test_put_settings_atomic_and_first_bulk_versioning(spark, tmp_path):
    import shutil as _sh

    import pytest as _pytest
    from pyspark.sql import functions as F

    from elasticsearch_spark.api import Engine
    from elasticsearch_spark.sources.pages import pages_df

    root = str(tmp_path / "atomic_rv")
    _sh.rmtree(root, ignore_errors=True)
    es = Engine(spark, root=root)
    es.create_index("pages", num_partitions=2)
    # first bulk with external versioning but no version column → rejected
    nover = pages_df(spark, 10, n_parts=1).drop("html")
    with _pytest.raises(ValueError, match="version"):
        es.bulk("pages", nover, version_type="external")
    es.bulk("pages", nover)
    # a request mixing a valid block with an invalid one applies NOTHING
    with _pytest.raises(ValueError, match="unsupported block"):
        es.put_settings("pages", {"index": {
            "blocks": {"write": True, "bogus": False},
            "similarity": {"default": {"k1": 1.5}},
        }})
    got = es.get_settings("pages")["pages"]["settings"]["index"]
    assert got["blocks"] == {}            # write block NOT half-applied
    assert got["similarity"]["default"]["k1"] == 1.2  # k1 untouched
    # script_fields survive _source filtering at the engine layer
    res = es.search("pages", {"query": {"term": {"lang": "en"}},
                              "script_fields": {"twice": {"script": "dl * 2"}},
                              "_source": False, "size": 2})
    assert "twice" in res["hits"].columns
    # completion entry-level text works as the prefix fallback
    res2 = es.search("pages", {"suggest": {
        "c": {"text": "t", "completion": {"field": "text", "size": 2}}}})
    assert res2["suggest"]["c"].count() >= 1


# ---------------------------------------------------------------------------
# wildcard resolution + indices options (IndexNameExpressionResolver.java;
# rest-api-spec/test/search/80_indices_options.yml)
# ---------------------------------------------------------------------------


def test_resolve_wildcards_and_options(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path))
    for n in ("logs-2024", "logs-2025", "metrics-1", ".hidden-sys"):
        es.create_index(n, num_partitions=2)

    assert es.resolve("logs-*") == ["logs-2024", "logs-2025"]
    assert es.resolve("_all") == ["logs-2024", "logs-2025", "metrics-1"]
    # implicit-hidden rule: dot indices match only dot patterns or hidden
    assert ".hidden-sys" not in es.resolve("*")
    assert es.resolve(".hidden*") == [".hidden-sys"]
    assert ".hidden-sys" in es.resolve("*", expand_wildcards="all")
    # exclusions subtract from the accumulated expansion
    assert es.resolve("logs-*,-logs-2025") == ["logs-2024"]
    # closed indices leave default (open) expansion, return under closed/all
    es.close_index("logs-2025")
    assert es.resolve("logs-*") == ["logs-2024"]
    assert es.resolve("logs-*", expand_wildcards="all") == ["logs-2024", "logs-2025"]
    es.open_index("logs-2025")
    # missing concrete name: loud by default, skipped under ignore_unavailable
    with pytest.raises(ValueError, match="index_not_found_exception"):
        es.resolve("nope")
    assert es.resolve("nope,logs-2024", ignore_unavailable=True) == ["logs-2024"]
    # empty wildcard: allowed by default, loud under allow_no_indices=false
    assert es.resolve("zz-*") == []
    with pytest.raises(ValueError, match="allow_no_indices"):
        es.resolve("zz-*", allow_no_indices=False)
    # aliases expand by wildcard too
    es.update_aliases([{"add": {"index": "metrics-1", "alias": "m-alias"}}])
    assert es.resolve("m-al*") == ["metrics-1"]


def test_search_over_wildcard_indices(spark, tmp_path):
    from pyspark.sql import functions as F

    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path))
    for i, n in enumerate(("web-a", "web-b")):
        es.create_index(n, num_partitions=2)
        docs = spark.createDataFrame(
            [(f"u{i}-1", "spark indexes the web", "en"),
             (f"u{i}-2", "unrelated text entirely", "en")],
            "url string, text string, lang string",
        ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
        es.bulk(n, docs)
    res = es.search("web-*", {"query": {"match": {"text": "spark"}}, "size": 10})
    urls = {r["url"] for r in res["hits"].collect()}
    assert urls == {"u0-1", "u1-1"}


def test_max_result_window_and_negative_params(spark, tmp_path):
    """30_limits.yml: from+size window validation + negative params."""
    from pyspark.sql import functions as F

    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path))
    es.create_index("t1", num_partitions=2)
    docs = spark.createDataFrame(
        [("u1", "foo bar", "en")], "url string, text string, lang string"
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
    es.bulk("t1", docs)
    with pytest.raises(ValueError, match="Result window is too large"):
        es.search("t1", {"query": {"match_all": {}}, "from": 10000})
    with pytest.raises(ValueError, match=r"\[from\] parameter cannot be negative"):
        es.search("t1", {"query": {"match_all": {}}, "from": -1})
    with pytest.raises(ValueError, match=r"\[size\] parameter cannot be negative"):
        es.search("t1", {"query": {"match_all": {}}, "size": -2})
    # the window is a dynamic per-index setting
    es.put_settings("t1", {"index": {"max_result_window": 20}})
    with pytest.raises(ValueError, match=r"equal to: \[20\]"):
        es.search("t1", {"query": {"match_all": {}}, "from": 15, "size": 10})
    assert es.search("t1", {"query": {"match_all": {}}, "from": 5, "size": 10})["hits"].count() == 0


def test_get_field_mapping(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path))
    es.create_index("t2", num_partitions=2)
    es.put_mapping("t2", {"properties": {
        "title": {"type": "text"}, "tag": {"type": "keyword"},
        "tstamp": {"type": "date"}}})
    out = es.get_field_mapping("t2", "t*")
    m = out["t2"]["mappings"]
    assert set(m) == {"title", "tag", "tstamp"}
    assert m["tag"]["mapping"]["tag"]["type"] == "keyword"
    assert es.get_field_mapping("t2", "nope")["t2"]["mappings"] == {}
