"""_scripts/painless/_execute context parity, pinned case-by-case against
the reference's own yaml REST suite
``modules/lang-painless/src/yamlRestTest/resources/rest-api-spec/test/
painless/70_execute_painless_scripts.yml`` (scripts, params, documents, and
expected results are copied verbatim from that suite; line refs inline).
Result shaping mirrors PainlessExecuteAction.java's per-context responses:
``*_field`` contexts emit LISTS (boolean_field sorted, date_field fixed
millis ISO, ip canonicalized, geo_point GeoJSON), filter→bool, score→double,
painless_test→Java toString.
"""

from __future__ import annotations

import pytest


@pytest.fixture()
def ex(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path / "pxc"))
    es.create_index("my-index", num_partitions=1)
    es.put_mapping("my-index", {"properties": {
        "rank": {"type": "long"},
        "field": {"type": "keyword"},
        "keyword": {"type": "keyword"},
        "text": {"type": "text"},
        "point": {"type": "geo_point"},
        "p0": {"type": "geo_point"},
        "p1": {"type": "geo_point"},
        "date": {"type": "date"},
        "date0": {"type": "date"},
        "date1": {"type": "date"},
        "ip": {"type": "ip"},
    }})
    return es


def run(ex, source, params=None, context=None, document=None, index="my-index"):
    body = {"source": source}
    if params:
        body["params"] = params
    setup = {"document": document, "index": index} if document is not None else None
    return ex.scripts_painless_execute(body, context=context,
                                       context_setup=setup)["result"]


def test_execute_with_defaults(ex):
    # 70_execute_painless_scripts.yml:31 "Execute with defaults"
    r = run(ex, "params.count / params.total",
            params={"count": 100.0, "total": 1000.0}, context="painless_test")
    assert r == "0.1"


def test_execute_painless_test_context(ex):
    # :43 "Execute with painless_test context" — int subtraction renders -90
    r = run(ex, "params.var1 - params.var2",
            params={"var1": 10, "var2": 100}, context="painless_test")
    assert r == "-90"


def test_execute_filter_context(ex):
    # :55 "Execute with filter context"
    r = run(ex, "doc['field'].value.length() <= params.max_length",
            params={"max_length": 4}, context="filter",
            document={"field": "four"})
    assert r is True


def test_execute_score_context(ex):
    # :69 "Execute with score context"
    r = run(ex, "doc['rank'].value / params.max_rank",
            params={"max_rank": 5.0}, context="score", document={"rank": 4})
    assert r == 0.8


def test_boolean_field_single(ex):
    # :83 "boolean field context (single-value)" — list even for one emit
    r = run(ex, "emit(doc['rank'].value < params.max_rank);",
            params={"max_rank": 5.0}, context="boolean_field",
            document={"rank": 4})
    assert r == [True]


def test_boolean_field_multi_sorted(ex):
    # :96 — emits true,false,false,true but BooleanFieldScript stores
    # false/true COUNTS, so the result is [false, false, true, true]
    r = run(ex, "emit(doc['rank'].value < params.max_rank); emit(false); "
                "emit(false); emit(true);",
            params={"max_rank": 5.0}, context="boolean_field",
            document={"rank": 4})
    assert r == [False, False, True, True]


def test_date_field_single(ex):
    # :122 "date field context (single-value)" — emitted epoch millis
    # render as fixed-millis ISO
    r = run(ex, "emit(doc['date'].value.toInstant().toEpochMilli())",
            context="date_field", document={"date": "2015-01-01T12:10:30Z"})
    assert r == ["2015-01-01T12:10:30.000Z"]


def test_date_field_multi(ex):
    # :136 — two date fields via doc[...][0]
    r = run(ex, "emit(doc['date0'][0].toInstant().toEpochMilli()); "
                "emit(doc['date1'][0].toInstant().toEpochMilli());",
            context="date_field",
            document={"date0": "2015-01-01T12:10:30Z",
                      "date1": "2010-11-30T13:14:35Z"})
    assert r == ["2015-01-01T12:10:30.000Z", "2010-11-30T13:14:35.000Z"]


def test_double_field_multi(ex):
    # :151/:166 "double field context"
    r = run(ex, "emit(doc['rank'].value * params.max_rank); emit(400.0); emit(55.0)",
            params={"max_rank": 5.0}, context="double_field",
            document={"rank": 4})
    assert r == [20.0, 400.0, 55.0]


def test_geo_point_field_single(ex):
    # :181 "geo point field context (single-value)" — emit(lat, lon),
    # GeoJSON coordinates come back [lon, lat]
    r = run(ex, "emit(doc['point'].value.lat + 1.0, doc['point'].value.lon - 1.0)",
            context="geo_point_field", document={"point": "30.0,40.0"})
    assert len(r) == 1
    assert r[0]["type"] == "Point"
    assert abs(r[0]["coordinates"][0] - 39.0) < 1e-5
    assert abs(r[0]["coordinates"][1] - 31.0) < 1e-5


def test_geo_point_field_multi(ex):
    # :199 multi-value over p0/p1
    r = run(ex, "emit(doc['p0'][0].lat + 1.0, doc['p0'][0].lon - 1.0); "
                "emit(doc['p1'][0].lat + 1.0, doc['p1'][0].lon - 1.0)",
            context="geo_point_field",
            document={"p0": "30.0,40.0", "p1": "40.0,30.0"})
    assert [p["type"] for p in r] == ["Point", "Point"]
    assert abs(r[0]["coordinates"][0] - 39.0) < 1e-5
    assert abs(r[1]["coordinates"][0] - 29.0) < 1e-5
    assert abs(r[1]["coordinates"][1] - 41.0) < 1e-5


def test_ip_field_canonicalizes(ex):
    # :219/:231 "ip field context" — full-form IPv6 canonicalizes
    r = run(ex, "emit('2001:0db8:0000:0000:0000:8a2e:0370:7333'); "
                "emit(doc['ip'].value); emit('2001:db8::8a2e:370:7334')",
            context="ip_field", document={"ip": "192.168.1.254"})
    assert r == ["2001:db8::8a2e:370:7333", "192.168.1.254",
                 "2001:db8::8a2e:370:7334"]


def test_long_field_with_cast(ex):
    # :246/:259 "long field context" — (long) cast of a double param
    r = run(ex, "emit(doc['rank'].value * (long)params.max_rank); emit(35); "
                "emit(0); emit(-90); emit(20);",
            params={"max_rank": 5.0}, context="long_field",
            document={"rank": 4})
    assert r == [20, 35, 0, -90, 20]


def test_keyword_field_multi(ex):
    # :275/:287 "keyword field context"
    r = run(ex, "emit(doc['keyword'].value); emit(doc['keyword'].value + '_test');",
            context="keyword_field", document={"keyword": "my_keyword"})
    assert r == ["my_keyword", "my_keyword_test"]


def test_empty_index_no_mappings(ex):
    # :301 "Execute against an empty index with no mappings"
    ex.create_index("empty-index", num_partitions=1)
    r = run(ex, "emit((long)params.max_rank)", params={"max_rank": 20.0},
            context="long_field", document={"rank": 4}, index="empty-index")
    assert r == [20]


def test_default_context_keeps_python_value(ex):
    # Python-native default (no explicit context): raw value, documented
    # divergence from the REST string rendering
    r = ex.scripts_painless_execute(
        {"source": "def t = 0; for (x in params.xs) { t += x } return t",
         "params": {"xs": [1, 2, 3]}})
    assert r["result"] == 6


# ---------------------------------------------------------------------------
# ScriptDocValues semantics pinned from the reference's
# 50_script_doc_values.yml (multi-value doc values are SORTED; .value is the
# minimum — ":812 doc values are sorted" / ":1255 double .value")
# ---------------------------------------------------------------------------

def _dv(raw):
    from elasticsearch_spark.functions import painless as P

    return P.DocValues(raw)


def test_doc_values_sorted_keyword():
    # 50_script_doc_values.yml:88,:812 — ["one string", "another string"]
    dv = _dv(["one string", "another string"])
    assert dv.value == "another string"
    assert dv.values == ["another string", "one string"]


def test_doc_values_sorted_numeric():
    # :89 long and :93 double
    assert _dv([1152921504606846976, 576460752303423488]).value == 576460752303423488
    assert _dv([3.141592653588, 2.141592653587]).value == 2.141592653587
    assert _dv([-3.5, 2.5]).value == -3.5  # scaled_float :94


def test_doc_values_sorted_dates():
    import datetime as dt

    from elasticsearch_spark.functions import painless as P

    # :86 — [2017-01-01T12:11:12, 2018-01-01T12:11:12]
    d17 = P.JDateTime(dt.datetime(2017, 1, 1, 12, 11, 12))
    d18 = P.JDateTime(dt.datetime(2018, 1, 1, 12, 11, 12))
    dv = _dv([d18, d17])
    assert dv.value is not None and dv.value.getYear() == 2017
    assert dv[1].getYear() == 2018


def test_doc_values_boolean_sorted_false_first():
    dv = _dv([True, False, True])
    assert dv.values == [False, True, True]


def test_script_fields_date_doc_values_fast_path(spark, tmp_path):
    # the index fast path (match query → search_topk) joins source columns
    # back for script_fields; Painless date accessors must run in the
    # interpreter there, not F.expr
    import pyspark.sql.functions as F

    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path / "sfd"))
    es.create_index("t", num_partitions=1)
    df = spark.createDataFrame(
        [("u1", "hello world", "en"), ("u2", "goodbye world", "en")],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.to_timestamp(F.lit("2017-01-01 12:11:12")))
    es.bulk("t", df)
    out = es.search("t", {"query": {"match": {"text": "world"}},
                          "script_fields": {
        "dow": {"script": {"source":
                "doc['warc_ts'].value.getDayOfWeekEnum().getValue()"}},
    }, "size": 5})
    rows = {r.url: r.dow for r in out["hits"].collect()}
    assert rows == {"u1": 7, "u2": 7}  # 2017-01-01 was a Sunday


def test_moving_fn_yaml_parity(spark):
    """70_mov_fn_agg.yml 'max': dates 1..6 with value 1..6, window 3,
    MovingFunctions.max(values) → bucket 0 absent, then 1,2,3,4,5 (the
    window EXCLUDES the current bucket at shift=0)."""
    from elasticsearch_spark.plans import aggs

    rows = [(f"2017-01-0{i}T00:00:00", float(i)) for i in range(1, 7)]
    df = spark.createDataFrame(rows, "date string, value_field double") \
        .selectExpr("cast(date as timestamp) as date", "value_field")
    out = aggs.aggregate(df, {
        "the_histo": {"date_histogram": {"field": "date",
                                         "calendar_interval": "1d"},
                      "aggs": {
            "the_avg": {"avg": {"field": "value_field"}},
            "the_mov_fn": {"moving_fn": {"buckets_path": "the_avg",
                                         "window": 3,
                                         "script": "MovingFunctions.max(values)"}},
        }}
    })["the_histo"]
    got = [r["the_mov_fn"] for r in out.orderBy("key").collect()]
    assert got == [None, 1.0, 2.0, 3.0, 4.0, 5.0]

    # stdDev composite from the same yaml (:305)
    out2 = aggs.aggregate(df, {
        "h": {"date_histogram": {"field": "date", "calendar_interval": "1d"},
              "aggs": {
            "a": {"avg": {"field": "value_field"}},
            "sd": {"moving_fn": {"buckets_path": "a", "window": 3,
                   "script": "MovingFunctions.stdDev(values, "
                             "MovingFunctions.unweightedAvg(values))"}},
        }}
    })["h"]
    got2 = [r["sd"] for r in out2.orderBy("key").collect()]
    assert got2[0] is None and got2[1] == 0.0
    import math
    assert got2[3] == math.sqrt(2 / 3)  # stdDev of [1,2,3]


def test_moving_fn_holt_winters_requires_two_seasons(spark):
    from elasticsearch_spark.functions import painless as P

    with pytest.raises(P.PainlessError, match="Holt-Winters"):
        P.execute(P.compile_painless(
            "MovingFunctions.holtWinters(values, 0.1, 0.1, 0.1, 3, false)"),
            {"values": [1.0, 2.0, 3.0], "params": {}})


def test_terms_agg_value_script_yaml(spark):
    """100_terms_agg.yml — terms agg with a value script over docs
    [str=abc ×2, str=bcd; number=1 ×2, number=2]: keys transform through
    the script (:57 'abc1'/'bcd1', :75 number+1)."""
    from elasticsearch_spark.plans import aggs

    df = spark.createDataFrame(
        [("abc", 1, 1.0), ("abc", 1, 1.0), ("bcd", 2, 2.0)],
        "str string, number long, double double")
    out = aggs.aggregate(df, {"str_terms": {"terms": {
        "field": "str", "script": {"source": 'return doc.str[0] + "1"'}}}})
    rows = {r["key"]: r["doc_count"] for r in out["str_terms"].collect()}
    assert rows == {"abc1": 2, "bcd1": 1}

    out = aggs.aggregate(df, {"long_terms": {"terms": {
        "field": "number", "script": {"source": "return doc.number[0] + 1"}}}})
    rows = {r["key"]: r["doc_count"] for r in out["long_terms"].collect()}
    assert rows == {2: 2, 3: 1}


def test_metric_agg_script_only(spark):
    from elasticsearch_spark.plans import aggs

    df = spark.createDataFrame(
        [(1.0, 2.0), (3.0, 4.0)], "a double, b double")
    out = aggs.aggregate(df, {"s": {"sum": {
        "script": {"source": "doc['a'].value * doc['b'].value"}}}})
    assert out["s"].collect()[0]["s"] == 14.0
    # field + script binds _value
    out = aggs.aggregate(df, {"m": {"max": {
        "field": "a", "script": {"source": "_value * 10"}}}})
    assert out["m"].collect()[0]["m"] == 30.0


def test_update_scripted_upsert_yaml(spark, tmp_path):
    """25_script_upsert.yml: plain upsert indexes the body untouched for a
    missing id; scripted_upsert runs the script over the upsert source
    first; ctx._now is visible; existing docs go through ctx._source."""
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path / "su"))
    es.create_index("test_1", num_partitions=1)
    # the engine's stored schema is fixed at first bulk (one docs schema per
    # index) — declare the update-target fields up front
    es.bulk("test_1", spark.createDataFrame(
        [("seed", "seed text", "en", None, None)],
        "url string, text string, lang string, foo string, has_now boolean"))

    # missing id + upsert WITHOUT scripted_upsert → body as-is (:1-40)
    es.update("test_1", "1", script={"source": "ctx._source.foo = params.bar",
                                     "params": {"bar": "xxx"}},
              upsert={"text": "t1", "lang": "en", "foo": "baz"})
    assert es.get("test_1", "1")["foo"] == "baz"

    # scripted_upsert: true → the script runs over the upsert doc (:41-57)
    es.update("test_1", "2", script={"source": "ctx._source.foo = params.bar",
                                     "params": {"bar": "xxx"}},
              upsert={"text": "t2", "lang": "en", "foo": "baz"},
              scripted_upsert=True)
    assert es.get("test_1", "2")["foo"] == "xxx"

    # ctx._now (:59-74)
    es.update("test_1", "3", script={"source": "ctx._source.has_now = ctx._now > 0"},
              upsert={"text": "t3", "lang": "en", "has_now": False},
              scripted_upsert=True)
    assert es.get("test_1", "3")["has_now"] is True

    # existing doc: script mutates _source; ctx.op = 'none' noops
    es.update("test_1", "seed", script={"source": "ctx._source.text = 'new text'"})
    assert es.get("test_1", "seed")["text"] == "new text"
    out = es.update("test_1", "seed", script={
        "source": "if (ctx._source.text == 'new text') { ctx.op = 'none' }"})
    assert out["result"] == "noop"

    # ctx.op = 'delete' removes the doc
    es.update("test_1", "2", script={"source": "ctx.op = 'delete'"})
    assert es.get("test_1", "2") is None

    # doc_as_upsert
    es.update("test_1", "4", doc={"text": "t4", "lang": "de"}, doc_as_upsert=True)
    assert es.get("test_1", "4")["lang"] == "de"


def test_runtime_fields_api_yaml(spark):
    """65_runtime_doc_values.yml subset: runtime_mappings scripts using the
    fields API — field('f') iteration, $('f', default) shorthand,
    dayOfWeekEnum.getDisplayName(TextStyle.FULL, Locale.ROOT), boolean
    negation over field().get(default)."""
    import pyspark.sql.functions as F

    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [("a", 5, 2, 1.5, True), ("b", 1, 1, 0.25, False)],
        "url string, short int, byte int, double double, boolean boolean",
    ).withColumn("date", F.to_timestamp(F.lit("2015-01-01 12:10:30")))
    body = {
        "query": {"match_all": {}},
        "runtime_mappings": {
            "day_of_week": {"type": "keyword", "script": {"source":
                "for (date in field('date')) { emit(date.dayOfWeekEnum"
                ".getDisplayName(TextStyle.FULL, Locale.ROOT)); }"}},
            "total_value_double": {"type": "double", "script": {"source":
                "emit($('short', 0) + $('byte', 0) + $('double', 0.0));"}},
            "reverse_boolean": {"type": "boolean", "script": {"source":
                "emit(!field('boolean').get(true));"}},
        },
        "sort": [{"url": "asc"}], "size": 10,
        "_source": ["url", "day_of_week", "total_value_double",
                    "reverse_boolean"],
    }
    rows = dsl.search(spark, df, body, key="url").collect()
    assert [r["day_of_week"] for r in rows] == ["Thursday", "Thursday"]
    assert [r["total_value_double"] for r in rows] == [8.5, 2.25]
    assert [r["reverse_boolean"] for r in rows] == [False, True]


def test_binary_doc_values_utf8(spark):
    """60_script_doc_values_binary.yml: BytesRef.utf8ToString over binary
    doc values."""
    from elasticsearch_spark.functions import painless as P

    env = {"params": {}, "doc": P.DocMap(
        {"binary": [b"Some binary blob", b"1234", b"test"]})}
    out = P.execute(P.compile_painless(
        "if (doc['binary'].size() == 0) {return 'empty'} "
        "doc['binary'].get(0).utf8ToString()"), env)
    assert out == "1234"  # doc values sort: b"1234" < b"Some..." < b"test"
    env2 = {"params": {}, "doc": P.DocMap({})}
    assert P.execute(P.compile_painless(
        "if (doc.get('binary').size() == 0) {return 'empty'} "
        "doc.get('binary').value.utf8ToString()"), env2) == "empty"


def test_scripted_metric_yaml_total(spark):
    """130_metric_agg.yml 'Scripted Metric Agg Total': list-state map,
    per-shard combine, reduce over shard partials → 4.0 over doubles
    [1.0, 1.0, 2.0]."""
    from elasticsearch_spark.plans import aggs

    df = spark.createDataFrame([(1.0,), (1.0,), (2.0,)], "double double") \
        .repartition(2)
    out = aggs.aggregate(df, {"total": {"scripted_metric": {
        "init_script": "state.transactions = []",
        "map_script": "state.transactions.add(doc['double'].value)",
        "combine_script": "double total = 0.0; "
                          "for (t in state.transactions) { total += t } "
                          "return total",
        "reduce_script": "double total = 0; "
                         "for (a in states) { total += a } return total",
    }}})
    assert out["total"].collect()[0]["total"] == 4.0


def test_script_score_boost_yaml(spark):
    """110_script_score_boost.yml: script_score multiplies by its boost,
    and the inner query's boost feeds _score (match_all boost 5 →
    150/100/50 with boost 10)."""
    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [("d1", 1.0), ("d2", 2.0), ("d3", 3.0)], "url string, num double")
    body = {"query": {"script_score": {
        "query": {"match_all": {}},
        "script": {"source": "doc['num'].value * _score"},
        "boost": 10,
    }}, "size": 5}
    rows = dsl.search(spark, df, body, key="url").orderBy(
        "_score", ascending=False).collect()
    assert [r["_score"] for r in rows] == [30.0, 20.0, 10.0]

    # ":51 Boost script_score and boost internal query": inner match_all
    # boost 5 feeds _score, outer boost 10 multiplies -> 150/100/50
    body2 = {"query": {"script_score": {
        "query": {"match_all": {"boost": 5}},
        "script": {"source": "doc['num'].value * _score"},
        "boost": 10,
    }}, "size": 5}
    rows2 = dsl.search(spark, df, body2, key="url").orderBy(
        "_score", ascending=False).collect()
    assert [r["_score"] for r in rows2] == [150.0, 100.0, 50.0]


def test_null_date_doc_value_is_missing(spark):
    """A null date cell must read as an EMPTY doc value, not crash the
    batch (NaT reaches the UDF for docs without the field)."""
    import pyspark.sql.functions as F

    from elasticsearch_spark.plans import dsl

    df = spark.createDataFrame(
        [("a", "2017-01-01 12:11:12"), ("b", None)], "url string, d string"
    ).withColumn("ts", F.to_timestamp("d")).drop("d")
    body = {"query": {"match_all": {}},
            "script_fields": {"has_ts": {"script": {
                "source": "doc['ts'].size() > 0"}}},
            "sort": [{"url": "asc"}], "size": 10}
    rows = dsl.search(spark, df, body, key="url").collect()
    assert [r["has_ts"] for r in rows] == [True, False]


def test_execute_date_epoch_millis_document(ex):
    # strict_date_optional_time||epoch_millis accepts a numeric document
    # value for a date-mapped field
    r = run(ex, "emit(doc['date'].value.toInstant().toEpochMilli())",
            context="date_field", document={"date": 1420114230000})
    assert r == ["2015-01-01T12:10:30.000Z"]


def test_update_object_field_refuses_cleanly(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path / "uo"))
    es.create_index("t", num_partitions=1)
    es.bulk("t", spark.createDataFrame(
        [("a", "x", "en")], "url string, text string, lang string"))
    with pytest.raises(ValueError, match="object field"):
        es.update("t", "a", script={
            "source": "ctx._source.meta = params.m",
            "params": {"m": {"a": 1}}})


def test_scroll_shard_doc_sort(spark, tmp_path):
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path / "ss"))
    es.create_index("t", num_partitions=1)
    es.bulk("t", spark.createDataFrame(
        [(f"u{i}", f"common text {i}", "en") for i in range(6)],
        "url string, text string, lang string"))
    out = es.search_scroll("t", {"query": {"match_all": {}},
                                 "sort": [{"_shard_doc": "asc"}], "size": 4})
    seen = [r["url"] for r in out["hits"]]
    out = es.scroll(out["_scroll_id"])
    seen += [r["url"] for r in out["hits"]]
    assert sorted(seen) == [f"u{i}" for i in range(6)]
    assert len(set(seen)) == 6


def test_put_script_compile_error(spark, tmp_path):
    """Stored scripts compile at PUT; invalid Painless rejects with a
    compile error (17_update_error.yml's /compile error/ contract)."""
    from elasticsearch_spark.api import Engine

    es = Engine(spark, root=str(tmp_path / "ps"))
    with pytest.raises(ValueError, match="compile error"):
        es.put_script("bad", {"script": {
            "source": "for (x in params.xs { sum += x }"}})
    # valid scripts still store and resolve
    es.put_script("good", {"script": {
        "source": "def t = 0; for (x in params.xs) { t += x } return t"}})
    out = es.scripts_painless_execute({"id": "good", "params": {"xs": [1, 2]}})
    assert out["result"] == 3


def test_score_context_builtins():
    """ScoreScriptUtils (the score context's imported_methods /
    class_bindings — 71_context_api.yml lists saturation and decayDateExp):
    saturation, sigmoid, and the nine decay functions at their half-decay
    points."""
    import datetime as dt

    from elasticsearch_spark.functions import painless as P

    env = {"params": {}, "doc": P.DocMap({
        "v": 50.0, "ts": P._clean(dt.datetime(2024, 1, 11)),
        "loc": P.GeoPoint(0.0, 1.0)})}
    run = lambda s: P.execute(P.compile_painless(s), dict(env))
    assert run("saturation(doc['v'].value, 10)") == pytest.approx(50 / 60)
    assert run("sigmoid(doc['v'].value, 50, 2)") == pytest.approx(0.5)
    assert run("decayNumericGauss(40, 10, 0, 0.5, doc['v'].value)") == \
        pytest.approx(0.5)
    assert run("decayNumericExp(0, 10, 0, 0.5, 10.0)") == pytest.approx(0.5)
    assert run("decayNumericLinear(0, 10, 0, 0.5, 5.0)") == pytest.approx(0.75)
    assert run("decayDateGauss('2024-01-01', '10d', '0d', 0.5, "
               "doc['ts'].value)") == pytest.approx(0.5)
    # 1 degree of longitude at the equator ≈ 111.2 km ≈ the 111km scale
    assert run("decayGeoExp('0,0', '111km', '0km', 0.5, doc['loc'].value)") \
        == pytest.approx(0.5, abs=0.01)


def test_mustache_template_functions():
    """lang_mustache/25_custom_functions.yml: {{#url}} percent-encodes the
    rendered inner content; {{#join}} comma-joins arrays; dotted names and
    the {{var}}{{^var}}default{{/var}} idiom resolve."""
    from elasticsearch_spark.api import render_template

    out = render_template(
        "https://localhost:9200/{{#url}}{{index}}{{/url}}/_search",
        {"index": "<logstash-{now/d-2d}>"})
    assert out == "https://localhost:9200/%3Clogstash-%7Bnow%2Fd-2d%7D%3E/_search"
    out = render_template(
        "{{#url}}https://localhost:9200/{{#join}}indices{{/join}}/_stats{{/url}}",
        {"indices": ["<logstash-{now/d-2d}>", "<logstash-{now/d-1d}>",
                     "<logstash-{now/d}>"]})
    assert out == ("https%3A%2F%2Flocalhost%3A9200%2F%3Clogstash-%7Bnow%2Fd-2d"
                   "%7D%3E%2C%3Clogstash-%7Bnow%2Fd-1d%7D%3E%2C%3Clogstash-"
                   "%7Bnow%2Fd%7D%3E%2F_stats")
    assert render_template('{"size": {{qp.size}}{{^qp.size}}10{{/qp.size}}}',
                           {"qp": {}}) == '{"size": 10}'
    assert render_template('{"size": {{qp.size}}{{^qp.size}}10{{/qp.size}}}',
                           {"qp": {"size": 5}}) == '{"size": 5}'


def test_parent_join_field_shape_multi_level(spark):
    """parent-join module (20_parent_join.yml): the join FIELD shape
    (join_field: {name, parent}) with multi-level relations parent →
    child → grand_child; a nested has_child sees grandchild rows."""
    from elasticsearch_spark.plans import dsl

    rows = [("1", "parent", None), ("2", "parent", None),
            ("3", "child", "1"), ("4", "child", "1"), ("5", "child", "2"),
            ("6", "grand_child", "5")]
    df = spark.createDataFrame(
        [(u, {"name": n, "parent": p}, u) for u, n, p in rows],
        "url string, join_field map<string,string>, id string")
    # parents that have a child which itself has a grand_child → parent 2
    body = {"query": {"has_child": {"type": "child", "query":
            {"has_child": {"type": "grand_child",
                           "query": {"match_all": {}}}}}}}
    out = dsl.search(spark, df, body, key="url")
    assert sorted(r["url"] for r in out.collect()) == ["2"]
    # has_parent over the map shape
    body2 = {"query": {"has_parent": {"parent_type": "parent",
                                      "query": {"term": {"id": {"value": "1"}}}}}}
    out2 = dsl.search(spark, df, body2, key="url")
    assert sorted(r["url"] for r in out2.collect()) == ["3", "4"]


def test_varargs_and_collectors_whitelist_tail():
    """The whitelist varargs statics and the Stream/Collectors subset
    (modules/lang-painless painless-common.json whitelist:
    String.format(String, Object...), Arrays.asList(Object...),
    String.join, java.util.stream.Collectors): the array-literal varargs
    form `new def[] {...}` spreads like Java's Object... rule."""
    from elasticsearch_spark.functions.painless import compile_painless, execute

    def run(src, **env):
        return execute(compile_painless(src), dict(env))

    # String.format with the Object... array form and literal %% escape
    assert run("return String.format('%03d-%s', new def[] {5, 'x'});") == "005-x"
    assert run("return String.format('%.2f', new def[] {3.14159});") == "3.14"
    assert run("return String.format('%d%%', new def[] {5});") == "5%"
    # direct varargs statics
    assert run("return Arrays.asList(1, 2, 3);") == [1, 2, 3]
    assert run("return String.join('-', 'a', 'b', 'c');") == "a-b-c"
    # typed array literals
    assert run("def a = new int[] {1, 2, 3}; return a[2];") == 3
    assert run("def a = new String[] {'x', 'y'}; return a.length;") == 2
    # Stream + Collectors
    assert run("def l = [1,2,3]; return l.stream().map(x -> x * 2)"
               ".collect(Collectors.toList());") == [2, 4, 6]
    assert run("def l = ['a','b']; return l.stream()"
               ".collect(Collectors.joining(','));") == "a,b"
    assert run("def l = ['a','b','a']; return l.stream()"
               ".collect(Collectors.toSet()).size();") == 2
    assert run("def l = ['ab','c']; return l.stream().collect("
               "Collectors.toMap(x -> x, x -> x.length()));") == {
        "ab": 2, "c": 1}
    assert run("def l = [1,2,3,4]; return l.stream()"
               ".filter(x -> x % 2 == 0).count();") == 2


# ---- round 5: generic casts are erasure-correct ----------------------------


def test_generic_casts_check_raw_type():
    """Reference-type casts check the RAW (erased) type like Java
    (AnalyzerCasterTests/DefCastTests ClassCastException semantics);
    generic type arguments are accepted-and-erased (the reference grammar
    PainlessParser.g4 `type` has no generics — accepting them is a
    documented extension, but the raw type must still be enforced)."""
    import pytest

    from elasticsearch_spark.functions.painless import (
        PainlessError, compile_painless, execute)

    def run(src):
        return execute(compile_painless(src), {})

    assert run("List x = [1,2,3]; return ((List<String>) x).size()") == 3
    assert run("def m = [:]; m.put('a', 1); "
               "return ((Map<String,def>) m).size()") == 1
    assert run("def x = new int[3]; return ((int[]) x).length") == 3
    assert run("Map<String, List<String>> m = new HashMap(); "
               "m.put('k', ['v']); return m['k'][0]") == "v"
    for src in ["def x = 5; return (List<String>) x",
                "def x = 5; return (List) x",
                "def x = [1]; return (Map) x",
                "def x = true; return (Number) x",
                "def x = 5; return (String[]) x"]:
        with pytest.raises(PainlessError, match="ClassCastException"):
            run(src)
    # numeric/def casts keep their conversion semantics
    assert run("return (int) 3.7") == 3
    assert run("def x = 4; return (double) x") == 4.0
