"""ES|QL pipe-language compiler (plans/esql.py) + Engine._query surface."""

from __future__ import annotations

import pytest

from elasticsearch_spark.plans.esql import _xlate, esql


@pytest.fixture(scope="module")
def ev(spark):
    return spark.createDataFrame(
        [
            (1, "click", 10.0, "u1", ["a", "b"]),
            (2, "click", 20.0, "u2", ["c"]),
            (3, "view", 5.0, "u1", []),
            (4, "checkout", 40.0, "u3", ["d", "e"]),
        ],
        "id long, event_type string, value double, user string, tags array<string>",
    )


def test_xlate_dialect_bridges():
    assert _xlate("a == 3") == "a = 3"
    assert _xlate('name LIKE "f*o?"') == "name LIKE 'f%o_'"
    assert _xlate('x == "it\'s"') == "x = 'it''s'"
    assert _xlate("COUNT_DISTINCT(u)") == "count(distinct u)"
    assert _xlate("MEDIAN(v)") == "percentile(v, 0.5)"
    assert _xlate("PERCENTILE(v, 95)") == "percentile(v, 0.95)"
    assert _xlate("DATE_TRUNC(1 day, ts)") == "date_trunc('day', ts)"
    assert _xlate("TO_LONG(x)") == "cast(x as bigint)"
    assert _xlate("TO_UPPER(s)") == "upper(s)"


def test_where_eval_keep_sort_limit(ev, spark):
    out = esql(spark, """
FROM events
| WHERE event_type LIKE "c*" AND value >= 10
| EVAL v2 = value * 2, tag = TO_UPPER(event_type)
| KEEP id, v2, tag
| SORT v2 DESC
| LIMIT 2
""", {"events": ev})
    rows = out.collect()
    assert [r.id for r in rows] == [4, 2]
    assert rows[0].v2 == 80.0 and rows[0].tag == "CHECKOUT"
    assert set(out.columns) == {"id", "v2", "tag"}


def test_stats_by(ev, spark):
    out = esql(spark, """
FROM events
| STATS n = COUNT(*), total = SUM(value), users = COUNT_DISTINCT(user) BY event_type
| SORT event_type ASC
""", {"events": ev})
    rows = {r.event_type: (r.n, r.total, r.users) for r in out.collect()}
    assert rows == {"checkout": (1, 40.0, 1), "click": (2, 30.0, 2), "view": (1, 5.0, 1)}


def test_stats_global_and_median(ev, spark):
    out = esql(spark, """
FROM events
| STATS m = MEDIAN(value), p = PERCENTILE(value, 100)
""", {"events": ev})
    r = out.collect()[0]
    assert r.m == 15.0 and r.p == 40.0


def test_row_rename_drop(spark):
    out = esql(spark, """
ROW a = 1, b = "x"
| RENAME b AS label
| EVAL c = a + 1
| DROP a
""", {})
    r = out.collect()[0]
    assert r.label == "x" and r.c == 2
    assert set(out.columns) == {"label", "c"}


def test_mv_expand_and_mv_count(ev, spark):
    out = esql(spark, """
FROM events
| EVAL n_tags = MV_COUNT(tags)
| WHERE n_tags > 0
| MV_EXPAND tags
| KEEP id, tags, n_tags
| SORT id ASC, tags ASC
""", {"events": ev})
    rows = [(r.id, r.tags) for r in out.collect()]
    assert rows == [(1, "a"), (1, "b"), (2, "c"), (4, "d"), (4, "e")]


def test_dissect(spark):
    df = spark.createDataFrame([("2024-01-01 GET /index.html",)], "line string")
    out = esql(spark, """
FROM logs
| DISSECT line "%{date} %{verb} %{path}"
| KEEP verb, path
""", {"logs": df})
    r = out.collect()[0]
    assert r.verb == "GET" and r.path == "/index.html"


def test_engine_esql(spark, tmp_path):
    from pyspark.sql import functions as F

    from elasticsearch_spark.api import Engine

    eng = Engine(spark, root=str(tmp_path))
    eng.create_index("pages", num_partitions=2)
    docs = spark.createDataFrame(
        [("u1", "alpha beta", "en"), ("u2", "gamma", "de")],
        "url string, text string, lang string",
    ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
    eng.bulk("pages", docs)
    out = eng.esql('FROM pages | WHERE lang == "en" | KEEP url, lang')
    assert [r.url for r in out.collect()] == ["u1"]


def test_enrich_and_lookup_join(ev, spark):
    users = spark.createDataFrame(
        [("u1", "alice", "admin"), ("u2", "bob", "dev")],
        "user string, name string, role string",
    )
    out = esql(spark, """
FROM events
| ENRICH users ON user WITH name
| KEEP id, name
| SORT id ASC
""", {"events": ev, "users": users})
    assert [(r.id, r.name) for r in out.collect()] == [
        (1, "alice"), (2, "bob"), (3, "alice"), (4, None)]
    out2 = esql(spark, """
FROM events
| LOOKUP JOIN users ON user
| WHERE role == "dev"
| KEEP id, role
""", {"events": ev, "users": users})
    assert [(r.id, r.role) for r in out2.collect()] == [(2, "dev")]


def test_match_function_in_where(spark):
    df = spark.createDataFrame(
        [(1, "spark is fast"), (2, "nothing here"), (3, "Merge SORT")],
        "id long, text string",
    )
    out = esql(spark, 'FROM d | WHERE MATCH(text, "spark merge") | KEEP id | SORT id ASC',
               {"d": df})
    assert [r.id for r in out.collect()] == [1, 3]


def test_xlate_literal_protection_and_plural_units():
    # rewrites must not touch string literals
    assert _xlate('msg == "a==b"') == "msg = 'a==b'"
    assert _xlate('msg == "median(x)"') == "msg = 'median(x)'"
    # nested calls in function rewrites
    assert _xlate("PERCENTILE(ABS(v), 95)") == "percentile(ABS(v), 0.95)"
    assert _xlate("MEDIAN(ABS(v))") == "percentile(ABS(v), 0.5)"
    # plural units normalize; multi-unit spans are rejected loudly
    assert _xlate("DATE_TRUNC(1 hours, ts)") == "date_trunc('hour', ts)"
    import pytest as _pt
    with _pt.raises(ValueError):
        _xlate("DATE_TRUNC(3 months, ts)")  # multi-unit CALENDAR spans only


def test_engine_esql_enrich(spark, tmp_path):
    from pyspark.sql import functions as F

    from elasticsearch_spark.api import Engine

    eng = Engine(spark, root=str(tmp_path))
    for idx, rows in (
        ("pages", [("u1", "alpha beta", "en"), ("u2", "gamma", "de")]),
        ("langs", [("l-en", "en English", "en"), ("l-de", "de German", "de")]),
    ):
        eng.create_index(idx, num_partitions=1)
        docs = spark.createDataFrame(
            rows, "url string, text string, lang string"
        ).withColumn("warc_ts", F.lit("2024-01-01").cast("timestamp"))
        eng.bulk(idx, docs)
    out = eng.esql(
        'FROM pages | LOOKUP JOIN langs ON lang | KEEP url, lang | SORT lang ASC'
    )
    rows = out.collect()
    assert [r.lang for r in rows] == ["de", "en"]
    # lookup-side fields shadow the input's same-named fields
    assert [r.url for r in rows] == ["l-de", "l-en"]


def test_change_point_command(spark):
    rows = [(float(i), 1.0 if i < 12 else 8.0) for i in range(24)]
    df = spark.createDataFrame(rows, "k double, v double")
    out = esql(spark, "FROM m | CHANGE_POINT v ON k | WHERE type IS NOT NULL", {"m": df})
    r = out.collect()
    assert len(r) == 1
    assert r[0].type == "step_change" and r[0].k == 12.0 and r[0].pvalue < 0.01


def test_esql_function_dialect_round2(spark):
    df = spark.createDataFrame(
        [(1, "Alpha", [1, 2, 3], "2024-03-05 10:30:00"),
         (2, "beta", [4, 4], "2024-07-01 00:00:00")],
        "id long, name string, xs array<int>, ts string",
    )
    out = esql(spark, """
ROW dummy = 1
| LIMIT 0
""")
    out = esql(spark, """
FROM t
| EVAL up = STARTS_WITH(TO_UPPER(name), "AL"),
       n = MV_SUM(xs), a = MV_AVG(xs), d = MV_DEDUPE(xs),
       grade = CASE(id == 1, "one", id == 2, "two", "many"),
       mon = DATE_EXTRACT("month", TO_DATETIME(ts)),
       day = DATE_FORMAT("yyyy-MM-dd", TO_DATETIME(ts))
| KEEP id, up, n, a, d, grade, mon, day
| SORT id ASC
""", {"t": df})
    r = out.collect()
    assert [x.up for x in r] == [True, False]
    assert [x.n for x in r] == [6.0, 8.0]
    assert [x.a for x in r] == [2.0, 4.0]
    assert [list(x.d) for x in r] == [[1, 2, 3], [4]]
    assert [x.grade for x in r] == ["one", "two"]
    assert [x.mon for x in r] == [3, 7]
    assert [x.day for x in r] == ["2024-03-05", "2024-07-01"]


def test_dialect_round2_fns(spark):
    from elasticsearch_spark.plans.esql import esql

    df = spark.createDataFrame(
        [("10.0.1.5", "2024-01-01 00:00:00", "2024-01-03 06:00:00", [3.0, 1.0, 2.0, 10.0], "hello world"),
         ("192.168.7.9", "2024-02-01 00:00:00", "2024-02-01 12:30:00", [5.0], "abc")],
        "ip string, t0s string, t1s string, vs array<double>, s string",
    ).selectExpr("ip", "cast(t0s as timestamp) t0", "cast(t1s as timestamp) t1", "vs", "s")
    out = esql(spark, '''
FROM t
| EVAL in_net = CIDR_MATCH(ip, "10.0.0.0/8", "172.16.0.0/12"),
       days = DATE_DIFF("day", t0, t1),
       l3 = LEFT(s, 3), r3 = RIGHT(s, 3),
       med = MV_MEDIAN(vs), f = MV_FIRST(vs), lst = MV_LAST(vs)
| KEEP ip, in_net, days, l3, r3, med, f, lst
| SORT ip ASC
''', {"t": df})
    rows = {r["ip"]: r for r in out.collect()}
    a, b = rows["10.0.1.5"], rows["192.168.7.9"]
    assert a["in_net"] is True and b["in_net"] is False
    assert a["days"] == 2 and b["days"] == 0
    assert (a["l3"], a["r3"]) == ("hel", "rld")
    assert a["med"] == 2.5 and b["med"] == 5.0  # even arity -> middle-two mean
    assert (a["f"], a["lst"]) == (3.0, 10.0)


def test_mv_concat(spark):
    from elasticsearch_spark.plans.esql import esql

    df = spark.createDataFrame([(["b", "a", "c"],)], "xs array<string>")
    out = esql(spark, 'FROM t | EVAL j = MV_CONCAT(MV_SORT(xs), "-") | KEEP j', {"t": df})
    assert out.collect()[0]["j"] == "a-b-c"


def test_fork_branches_union_with_discriminator(spark):
    from elasticsearch_spark.plans.esql import esql

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)],
        "id long, k string, v double")
    out = esql(spark, """
FROM t
| FORK (WHERE v >= 30 | SORT v DESC | KEEP id, k, v)
       (STATS n = COUNT(*), s = SUM(v) BY k)
""", {"t": df}).collect()
    f1 = sorted((r["id"], r["v"]) for r in out if r["_fork"] == "fork1")
    assert f1 == [(3, 30.0), (4, 40.0)]
    # stats branch rows carry nulls for the detail-only columns
    f2 = {r["k"]: (r["n"], r["s"], r["id"], r["v"]) for r in out if r["_fork"] == "fork2"}
    assert f2 == {"a": (2, 30.0, None, None), "b": (2, 70.0, None, None)}


def test_fork_nested_parens_and_post_commands(spark):
    from elasticsearch_spark.plans.esql import esql

    df = spark.createDataFrame([(1, 2.0), (2, 4.0)], "id long, v double")
    out = esql(spark, """
FROM t
| FORK (EVAL w = ROUND((v + 1.0), 1) | KEEP id, w) (STATS m = MAX(v))
| SORT _fork ASC, id ASC
""", {"t": df}).collect()
    assert [r["_fork"] for r in out] == ["fork1", "fork1", "fork2"]
    assert out[0]["w"] == 3.0 and out[2]["m"] == 4.0


def test_rerank_scores_and_orders_by_relevance(spark):
    from elasticsearch_spark.plans.esql import esql

    df = spark.createDataFrame(
        [(1, "spark cluster data processing engine"),
         (2, "cooking recipes with garlic and onions"),
         (3, "distributed data processing on a spark cluster")],
        "id long, body string")
    out = esql(spark, '''
FROM t
| RERANK "spark cluster data processing" ON body
| KEEP id, _score
''', {"t": df}).collect()
    assert [r["id"] for r in out][0] in (1, 3)     # topical docs first
    assert out[-1]["id"] == 2                      # off-topic last
    assert out[0]["_score"] > 0.5 > out[-1]["_score"]
    # exact self-match: doc 1 token-set == query token-multiset superset;
    # score strictly below 1 unless identical multiset
    assert all(-1.0 <= r["_score"] <= 1.0 + 1e-9 for r in out)


def test_completion_command_requires_and_uses_registered_model(spark):
    from elasticsearch_spark.functions.inference import register_completion
    from elasticsearch_spark.plans.esql import esql

    df = spark.createDataFrame([(1, "alpha"), (2, "beta")], "id long, w string")
    with pytest.raises(Exception, match="no completion model registered"):
        esql(spark, 'FROM t | COMPLETION CONCAT("say: ", w) WITH missing-model',
             {"t": df}).collect()
    register_completion("upper-echo", lambda prompts: [p.upper() for p in prompts])
    out = esql(spark, '''
FROM t
| COMPLETION reply = CONCAT("say: ", w) WITH upper-echo
| SORT id ASC
''', {"t": df}).collect()
    assert [r["reply"] for r in out] == ["SAY: ALPHA", "SAY: BETA"]


def test_xlate_scalar_long_tail():
    assert _xlate('s RLIKE "ab.*"') == "s RLIKE '^(?:ab.*)$'"
    assert _xlate("x::long + 1") == "cast(x as bigint) + 1"
    assert _xlate("x::keyword") == "cast(x as string)"
    assert _xlate('LOCATE(s, "b")') == "locate('b', s)"
    assert _xlate('SPLIT(s, ".")') == "split(s, '\\\\.')"
    assert _xlate('HASH("sha256", s)') == "sha2(s, 256)"
    assert _xlate("TAU()") == "(2 * pi())"
    assert _xlate("BYTE_LENGTH(s)") == "octet_length(s)"
    assert _xlate('DATE_PARSE("yyyy-MM-dd", d)') == "to_timestamp(d, 'yyyy-MM-dd')"


def test_scalar_long_tail_eval(spark):
    df = spark.createDataFrame(
        [("10.20.130.7", "a.b.c", [1.0, 2.0, 3.0, 4.0], "hello")],
        "ip string, dotted string, vs array<double>, s string")
    out = esql(spark, '''
FROM t
| EVAL net = IP_PREFIX(ip, 20, 0),
       parts = SPLIT(dotted, "."),
       p75 = MV_PERCENTILE(vs, 75),
       sl = MV_SLICE(vs, 1, 2),
       sl2 = MV_SLICE(vs, -2),
       z = MV_ZIP(SPLIT(dotted, "."), SPLIT(dotted, "."), "+"),
       ap = MV_APPEND(vs, vs),
       ps = MV_PSERIES_WEIGHTED_SUM(vs, 1.0),
       h = HASH("md5", s), h2 = SHA256(s),
       b64 = TO_BASE64(s), rb = FROM_BASE64(TO_BASE64(s)),
       pos = LOCATE(s, "llo"),
       rep = REPLACE(s, "l+", "L"),
       deg = ROUND(TO_DEGREES(PI()), 4)
| KEEP net, parts, p75, sl, sl2, z, ap, ps, h, h2, b64, rb, pos, rep, deg
''', {"t": df})
    r = out.collect()[0]
    assert r.net == "10.20.128.0"
    assert list(r.parts) == ["a", "b", "c"]
    assert r.p75 == 3.25
    assert list(r.sl) == [2.0, 3.0] and list(r.sl2) == [3.0]
    assert list(r.z) == ["a+a", "b+b", "c+c"]
    assert list(r.ap) == [1.0, 2.0, 3.0, 4.0, 1.0, 2.0, 3.0, 4.0]
    assert r.ps == 4.0
    assert r.h == "5d41402abc4b2a76b9719d911017c592"
    assert r.h2 == "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824"
    assert r.b64 == "aGVsbG8=" and r.rb == "hello"
    assert r.pos == 3
    assert r.rep == "heLo"
    assert r.deg == 180.0


def test_stats_per_agg_where(ev, spark):
    out = esql(spark, """
FROM events
| STATS n_click = COUNT(*) WHERE event_type == "click",
        v_big = SUM(value) WHERE value >= 20 BY user
| SORT user ASC
""", {"events": ev})
    rows = [(r.user, r.n_click, r.v_big) for r in out.collect()]
    assert rows == [("u1", 1, None), ("u2", 1, 20.0), ("u3", 0, 40.0)]


def test_rlike_and_cast_operator(spark):
    df = spark.createDataFrame([("abc", "5"), ("xabc", "7")], "s string, n string")
    out = esql(spark,
               'FROM t | WHERE s RLIKE "ab." | EVAL m = n::long * 2 | KEEP s, m',
               {"t": df})
    assert [(r.s, r.m) for r in out.collect()] == [("abc", 10)]


def test_bucket_xlate_forms():
    assert _xlate("BUCKET(ts, 1 hour)") == "date_trunc('hour', ts)"
    assert _xlate("BUCKET(ts, 1 week)") == "date_trunc('week', ts)"
    assert "unix_timestamp(ts) / 10800" in _xlate("BUCKET(ts, 3 hours)")
    assert _xlate("BUCKET(v, 50.0)") == "(floor((v) / (50.0)) * (50.0))"
    # the documented reference examples: 20 buckets over a year -> monthly;
    # 20 buckets over the salary range -> width 5000
    assert _xlate(
        'BUCKET(d, 20, "1985-01-01T00:00:00Z", "1986-01-01T00:00:00Z")'
    ) == "date_trunc('month', d)"
    assert "5000" in _xlate("BUCKET(s, 20, 25324, 74999)")


def test_stats_by_bucket_and_agg_long_tail(spark):
    import datetime

    rows = [(datetime.datetime(2024, 1, 1, h, m), float(h))
            for h in range(3) for m in (0, 30)]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = esql(spark, """
FROM t
| STATS n = COUNT(*), w = WEIGHTED_AVG(v, v + 1),
        tp = TOP(v, 2), vals = VALUES(v) BY b = BUCKET(ts, 1 hour)
| SORT b ASC
""", {"t": df})
    got = [(r.b.hour, r.n, r.w, list(r.tp), list(r.vals)) for r in out.collect()]
    assert got == [(0, 2, 0.0, [0.0, 0.0], [0.0]),
                   (1, 2, 1.0, [1.0, 1.0], [1.0]),
                   (2, 2, 2.0, [2.0, 2.0], [2.0])]


def test_ts_rate_stats(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [("a", base + datetime.timedelta(seconds=60 * i), v)
            for i, v in enumerate([0.0, 10.0, 20.0, 5.0])]   # 5.0 = counter reset
    rows += [("b", base, 100.0), ("b", base + datetime.timedelta(seconds=60), 130.0)]
    df = spark.createDataFrame(rows, "pod string, ts timestamp, reqs double")
    out = esql(spark, """
TS m
| STATS r = AVG(RATE(reqs)) BY b = BUCKET(ts, 1 hour), pod
| SORT pod ASC
""", {"m": df}, dims=["pod"])
    got = [(r.pod, round(r.r, 6)) for r in out.collect()]
    # pod a: increases 10+10+5(reset-to-5) = 25 over 180 s; pod b: 30 over 60 s
    assert got == [("a", round(25 / 180, 6)), ("b", 0.5)]
    out2 = esql(spark, "TS m | STATS r = SUM(RATE(reqs)) BY b = BUCKET(ts, 1 hour)",
                {"m": df}, dims=["pod"])
    assert round(out2.collect()[0].r, 6) == round(25 / 180 + 0.5, 6)
    # a non-OUTER(RATE()) aggregate in a RATE STATS refuses loudly
    with pytest.raises(ValueError, match="OUTER"):
        esql(spark, "TS m | STATS r = RATE(reqs) BY pod", {"m": df}, dims=["pod"])


def test_ts_rate_alias_shadows_time_column(spark):
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [("a", base + datetime.timedelta(seconds=60 * i), float(10 * i))
            for i in range(4)]
    df = spark.createDataFrame(rows, "pod string, ts timestamp, reqs double")
    out = esql(spark, """
TS m
| STATS r = AVG(RATE(reqs)) BY ts = BUCKET(ts, 1 hour)
""", {"m": df}, dims=["pod"])
    r = out.collect()[0].r
    assert r is not None and round(r, 6) == round(30 / 180, 6)


def test_xlate_cast_and_agg_where_review_fixes(spark):
    from elasticsearch_spark.plans.esql import _agg_where

    assert _xlate("(a + b)::long") == "cast((a + b) as bigint)"
    assert _xlate("x[1]::datetime") == "cast(x[1] as timestamp)"
    assert _agg_where('COUNT(*) WHERE msg == "no where to go"') == \
        'COUNT(*) FILTER (WHERE msg == "no where to go")'
    df = spark.createDataFrame([(1, "no where to go"), (2, "x")], "id long, msg string")
    out = esql(spark, 'FROM t | STATS n = COUNT(*) WHERE msg == "no where to go"',
               {"t": df})
    assert out.collect()[0].n == 1


def test_dissect_modifiers(spark):
    df = spark.createDataFrame(
        [("2024-01-01 GET   /idx a b",)], "line string")
    out = esql(spark, """
FROM logs
| DISSECT line "%{date} %{verb->} %{path} %{+verb} %{?junk}"
| KEEP date, verb, path
""", {"logs": df})
    r = out.collect()[0]
    assert r.date == "2024-01-01" and r.path == "/idx"
    assert r.verb == "GETa"      # append with default empty separator
    out2 = esql(spark, '''
FROM logs
| DISSECT line "%{date} %{verb->} %{path} %{+verb} %{?junk}" APPEND_SEPARATOR="_"
| KEEP verb
''', {"logs": df})
    assert out2.collect()[0].verb == "GET_a"


def test_categorize_grouping(spark):
    df = spark.createDataFrame(
        [("Connected to 10.1.0.1",), ("Connected to 10.1.0.2",),
         ("Connection error",), ("Connection error",), ("Disconnected",)],
        "msg string")
    out = esql(spark, """
FROM t
| STATS n = COUNT(*) BY k = CATEGORIZE(msg)
| SORT n DESC, k ASC
""", {"t": df})
    assert [(r.k, r.n) for r in out.collect()] == [
        ("connected to", 2), ("connection error", 2), ("disconnected", 1)]


def test_esql_spatial_functions(spark):
    df = spark.createDataFrame([("POINT(2.3522 48.8566)",)], "wkt string")
    out = esql(spark, '''
FROM t
| EVAL p = TO_GEOPOINT("POINT(2.3522 48.8566)"),
       pc = TO_GEOPOINT(wkt),
       q = TO_GEOPOINT("POINT(-0.1278 51.5074)"),
       d_km = ROUND(ST_DISTANCE(p, q) / 1000, 0),
       x = ST_X(p), y = ST_Y(p), xc = ST_X(pc)
| KEEP d_km, x, y, xc
''', {"t": df})
    r = out.collect()[0]
    assert r.x == 2.3522 and r.y == 48.8566 and r.xc == 2.3522
    assert 330 <= r.d_km <= 350   # Paris-London ~344 km great-circle


def test_like_rlike_pattern_lists():
    assert _xlate('name LIKE ("a*", "b?")') == "(name LIKE 'a%' OR name LIKE 'b_')"
    assert _xlate('name NOT LIKE ("a*","c")') == "NOT (name LIKE 'a%' OR name LIKE 'c')"
    assert _xlate('name RLIKE ("ab.", "cd+")') == \
        "(name RLIKE '^(?:ab.)$' OR name RLIKE '^(?:cd+)$')"
    # single-pattern forms unchanged
    assert _xlate('name LIKE "f*o?"') == "name LIKE 'f%o_'"


def test_date_trunc_multi_unit_and_round_to():
    assert "unix_timestamp(ts) / 10800" in _xlate("DATE_TRUNC(3 hours, ts)")
    assert _xlate("DATE_TRUNC(1 day, ts)") == "date_trunc('day', ts)"
    assert _xlate("ROUND_TO(v, 0, 50, 100)") == (
        "(CASE WHEN (v) IS NULL THEN CAST(NULL AS DOUBLE)"
        " WHEN (v) >= 100.0 THEN 100.0 WHEN (v) >= 50.0 THEN 50.0 ELSE 0.0 END)")
    import pytest as _pt
    with _pt.raises(ValueError):
        _xlate("DATE_TRUNC(3 months, ts)")


def test_round_to_and_pattern_list_review_fixes():
    assert _xlate("ROUND_TO(v, 5)") == \
        "(CASE WHEN (v) IS NULL THEN CAST(NULL AS DOUBLE) ELSE 5.0 END)"
    assert "IS NULL THEN CAST(NULL AS DOUBLE)" in _xlate("ROUND_TO(v, 0, 50)")
    # pattern content containing a bridged function name stays data
    assert _xlate('name RLIKE ("left(x)")') == "(name RLIKE '^(?:left(x))$')"
    import pytest as _pt
    with _pt.raises(ValueError):
        _xlate("DATE_TRUNC(2 weeks, ts)")
    with _pt.raises(ValueError):
        _xlate("BUCKET(ts, 2 weeks)")


def test_std_dev_and_mv_mad(spark):
    assert _xlate("STD_DEV(v)") == "stddev_pop(v)"
    df = spark.createDataFrame(
        [(1, 2.0, [1.0, 2.0, 3.0, 10.0]), (2, 4.0, [5.0])],
        "id long, v double, xs array<double>")
    out = esql(spark, """
FROM t
| EVAL mad = MV_MEDIAN_ABSOLUTE_DEVIATION(xs)
| STATS sd = ROUND(STD_DEV(v), 6), mads = MV_SORT(VALUES(mad))
""", {"t": df})
    r = out.collect()[0]
    assert r.sd == 1.0  # population stddev of [2, 4]
    # xs=[1,2,3,10]: median 2.5, |x-2.5| = [1.5, .5, .5, 7.5] -> median 1.0
    assert sorted(r.mads) == [0.0, 1.0]


def test_median_absolute_deviation_aggregate(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 4.0), ("a", 6.0), ("b", 1.0)], "g string, v double")
    out = esql(spark, """
FROM t
| STATS m = MEDIAN_ABSOLUTE_DEVIATION(v) BY g
| SORT g ASC
""", {"t": df})
    assert [(r.g, r.m) for r in out.collect()] == [("a", 2.0), ("b", 0.0)]


def test_qstr_kql_where(spark):
    df = spark.createDataFrame(
        [(1, "spark engine fast", "en"), (2, "slow cooker", "de"),
         (3, "spark plugs", "en")],
        "id long, text string, lang string")
    out = esql(spark, 'FROM t | WHERE QSTR("spark AND lang:en") | KEEP id | SORT id ASC',
               {"t": df})
    assert [r.id for r in out.collect()] == [1, 3]
    out2 = esql(spark, 'FROM t | WHERE KQL("slow* OR lang:de") | KEEP id', {"t": df})
    assert [r.id for r in out2.collect()] == [2]


def test_query_params_binding(spark):
    df = spark.createDataFrame(
        [(1, "click", 10.0), (2, "view", 30.0)], "id long, et string, v double")
    out = esql(spark, "FROM t | WHERE et == ? AND v < ? | KEEP id",
               {"t": df}, params=["click", 20])
    assert [r.id for r in out.collect()] == [1]
    out2 = esql(spark, "FROM t | WHERE et == ?kind | KEEP id",
                {"t": df}, params={"kind": "view"})
    assert [r.id for r in out2.collect()] == [2]
    # `?` inside string literals is data, not a placeholder
    out3 = esql(spark, 'FROM t | WHERE et LIKE "cl?ck" AND v == ?1 | KEEP id',
                {"t": df}, params=[10.0])
    assert [r.id for r in out3.collect()] == [1]
    # `?` inside a BOUND string value stays data (the positional pass must
    # not rescan text the indexed pass inserted)
    df2 = spark.createDataFrame([(1, "what?"), (2, "ok")], "id long, s string")
    out4 = esql(spark, "FROM t | WHERE s == ?1 | KEEP id",
                {"t": df2}, params=["what?"])
    assert [r.id for r in out4.collect()] == [1]


def test_esql_review_regressions(spark):
    from elasticsearch_spark.plans.esql import esql

    df = spark.createDataFrame(
        [(1, "2*3", None), (2, "2%3", 5.0), (3, "x", 1.0)],
        "id long, s string, v double")
    tables = {"t": df}
    # SORT default: null sorts LARGEST (asc → nulls last)
    out = esql(spark, 'FROM t | SORT v | KEEP id', tables).collect()
    assert [r["id"] for r in out] == [3, 2, 1]
    out2 = esql(spark, 'FROM t | SORT v DESC | KEEP id', tables).collect()
    assert [r["id"] for r in out2] == [1, 2, 3]
    # escaped wildcard in LIKE = literal character
    out3 = esql(spark, 'FROM t | WHERE s LIKE "2\\\\*3" | KEEP id', tables).collect()
    assert [r["id"] for r in out3] == [1]
    # nested same-name calls both rewrite (REPLACE is regex in ES|QL)
    out4 = esql(
        spark,
        'ROW s = "aXbY" | EVAL r = REPLACE(REPLACE(s, "X.", "-"), "a", "_")',
        {}).collect()
    assert out4[0]["r"] == "_-Y"
    # quoted 'by' inside a STATS WHERE literal is data, not the BY keyword
    df2 = spark.createDataFrame(
        [("sold by agent", "k1"), ("direct", "k1")], "note string, k string")
    out5 = esql(
        spark,
        'FROM t2 | STATS c = COUNT(*) WHERE note == "sold by agent" BY k',
        {"t2": df2}).collect()
    assert [(r["k"], r["c"]) for r in out5] == [("k1", 1)]
    # MV_PERCENTILE of an empty array is NULL, not a crash
    df3 = spark.createDataFrame(
        [(1, [1.0, 3.0]), (2, [])], "id long, a array<double>")
    out6 = {r["id"]: r["p"] for r in esql(
        spark, 'FROM t3 | EVAL p = MV_PERCENTILE(a, 50) | KEEP id, p',
        {"t3": df3}).collect()}
    assert out6[1] == 2.0 and out6[2] is None
