"""Ingest-pipeline processor tests (sources/ingest_pipeline.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from elasticsearch_spark.sources.ingest_pipeline import run_pipeline


@pytest.fixture(scope="module")
def logs(spark):
    rows = [
        (1, "  HELLO World  ", "2024-03-05T10:20:30", "a=1 b=2", "alice,30,paris",
         "2024-03-05 10:20:30 ERROR disk full", "10kb", ["X", "Y"]),
        (2, "foo BAR baz", "2024-03-06T11:00:00", "k=v x=y", "bob,25,rome",
         "2024-03-06 11:00:00 INFO all good", "2mb", ["z"]),
    ]
    return spark.createDataFrame(
        rows,
        "id long, msg string, ts_str string, kvs string, csvline string, "
        "logline string, sz string, arr array<string>",
    )


def test_string_processors(spark, logs):
    out = run_pipeline(logs, [
        {"trim": {"field": "msg"}},
        {"lowercase": {"field": "msg"}},
        {"gsub": {"field": "msg", "pattern": "world", "replacement": "earth"}},
        {"split": {"field": "msg", "separator": " ", "target_field": "words"}},
        {"join": {"field": "words", "separator": "-", "target_field": "joined"}},
    ])
    r = out.where("id = 1").collect()[0]
    assert r["msg"] == "hello earth"
    assert r["words"] == ["hello", "earth"]
    assert r["joined"] == "hello-earth"


def test_date_convert_csv_kv(spark, logs):
    out = run_pipeline(logs, [
        {"date": {"field": "ts_str", "formats": ["yyyy-MM-dd'T'HH:mm:ss"], "target_field": "ts"}},
        {"csv": {"field": "csvline", "target_fields": ["name", "age", "city"]}},
        {"convert": {"field": "age", "type": "integer"}},
        {"kv": {"field": "kvs", "field_split": " ", "value_split": "=", "target_field": "kv"}},
    ])
    r = out.where("id = 1").collect()[0]
    assert r["ts"] == dt.datetime(2024, 3, 5, 10, 20, 30)
    assert r["name"] == "alice" and r["age"] == 30
    assert r["kv"]["a"] == "1" and r["kv"]["b"] == "2"


def test_grok_and_dissect(spark, logs):
    out = run_pipeline(logs, [
        {"grok": {"field": "logline",
                  "patterns": ["%{TIMESTAMP_ISO8601:when} %{LOGLEVEL:level} %{GREEDYDATA:what}"]}},
    ])
    r = out.where("id = 1").collect()[0]
    assert r["level"] == "ERROR" and r["what"] == "disk full"
    out2 = run_pipeline(logs, [
        {"dissect": {"field": "csvline", "pattern": "%{nm},%{ag},%{ct}"}},
    ])
    r2 = out2.where("id = 2").collect()[0]
    assert (r2["nm"], r2["ag"], r2["ct"]) == ("bob", "25", "rome")


def test_bytes_fingerprint_script_foreach(spark, logs):
    out = run_pipeline(logs, [
        {"bytes": {"field": "sz", "target_field": "sz_bytes"}},
        {"fingerprint": {"fields": ["id", "msg"]}},
        {"script": {"source": "id * 10", "target_field": "id10"}},
        {"foreach": {"field": "arr", "processor": {"lowercase": {}}}},
    ])
    rs = {r["id"]: r for r in out.collect()}
    assert rs[1]["sz_bytes"] == 10240 and rs[2]["sz_bytes"] == 2 * 1048576
    assert rs[1]["fingerprint"] != rs[2]["fingerprint"]
    assert rs[1]["id10"] == 10
    assert rs[1]["arr"] == ["x", "y"]


def test_conditional_set_and_drop(spark, logs):
    out = run_pipeline(logs, [
        {"set": {"field": "flag", "value": "big", "if": "id > 1"}},
    ])
    rs = {r["id"]: r["flag"] for r in out.collect()}
    assert rs[1] is None and rs[2] == "big"
    out2 = run_pipeline(logs, [{"drop": {"if": "id = 1"}}])
    assert [r["id"] for r in out2.collect()] == [2]


def test_rename_remove_append(spark, logs):
    out = run_pipeline(logs, [
        {"rename": {"field": "msg", "target_field": "message"}},
        {"append": {"field": "arr", "value": ["W"]}},
        {"remove": {"field": ["kvs", "csvline"]}},
    ])
    assert "message" in out.columns and "msg" not in out.columns
    assert "kvs" not in out.columns
    assert out.where("id = 2").collect()[0]["arr"] == ["z", "W"]


def test_uri_parts_processor(spark):
    df = spark.createDataFrame(
        [("https://user@www.example.com:8080/a/b.html?x=1#frag",)], "u string"
    )
    out = run_pipeline(df, [{"uri_parts": {"field": "u", "target_field": "url"}}])
    r = out.collect()[0]
    assert r["url.scheme"] == "https"
    assert r["url.domain"] == "www.example.com"
    assert r["url.port"] == "8080"
    assert r["url.path"] == "/a/b.html"
    assert r["url.query"] == "x=1"
    assert r["url.fragment"] == "frag"
    assert r["url.extension"] == "html"


def test_user_agent_processor(spark):
    uas = [
        ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",),
        ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.1 Safari/605.1.15",),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_0 like Mac OS X) AppleWebKit/605.1.15 (KHTML, like Gecko) Version/17.0 Mobile/15E148 Safari/604.1",),
        ("Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Gecko/20100101 Firefox/115.0",),
    ]
    df = spark.createDataFrame(uas, "ua string")
    out = run_pipeline(df, [{"user_agent": {"field": "ua"}}]).collect()
    got = [(r["user_agent.name"], r["user_agent.os"], r["user_agent.device"]) for r in out]
    assert got == [
        ("Chrome", "Windows", "Desktop"),
        ("Safari", "Mac OS X", "Desktop"),
        ("Safari", "iOS", "Phone"),
        ("Firefox", "Linux", "Desktop"),
    ]
    assert out[0]["user_agent.version"].startswith("120.")


def test_dot_expander_and_pipeline_processor(spark):
    df = spark.createDataFrame([(1, "x")], "id long, `a.b` string")
    out = run_pipeline(df, [{"pipeline": {"processors": [
        {"dot_expander": {"field": "a.b"}},
        {"set": {"field": "tag", "value": "t"}},
    ]}}])
    r = out.collect()[0]
    assert r.a.b == "x" and r.tag == "t"
    assert "a.b" not in out.columns


def test_dot_expander_multi_level_and_no_dot(spark):
    df = spark.createDataFrame([(1, "x")], "id long, `a.b.c` string")
    out = run_pipeline(df, [{"dot_expander": {"field": "a.b.c"}}])
    assert out.collect()[0].a.b.c == "x"
    with pytest.raises(ValueError):
        run_pipeline(df, [{"dot_expander": {"field": "id"}}])


def test_inference_processor(spark):
    from elasticsearch_spark.functions.inference import register_completion
    from elasticsearch_spark.sources.ingest_pipeline import run_pipeline

    df = spark.createDataFrame([("hello world",), ("other text",)], "text string")
    # default hash embedder → deterministic normalized vector
    out = run_pipeline(df, [{"inference": {
        "model_id": "hash_embed",
        "input_output": [{"input_field": "text", "output_field": "emb"}]}}])
    rows = out.collect()
    assert len(rows[0].emb) == 64
    assert abs(sum(x * x for x in rows[0].emb) - 1.0) < 1e-5
    # identical text → identical vector (determinism)
    out2 = run_pipeline(df, [{"inference": {
        "model_id": "hash_embed",
        "input_output": [{"input_field": "text", "output_field": "emb"}]}}])
    assert rows[0].emb == out2.collect()[0].emb
    # an UNREGISTERED id refuses loudly instead of silently hash-embedding
    # (a restarted driver would otherwise embed queries in a different
    # space than the registered model embedded the documents)
    import pytest as _pytest
    with _pytest.raises(KeyError, match="unknown inference id"):
        run_pipeline(df, [{"inference": {
            "model_id": "my-embedder",
            "input_output": [{"input_field": "text", "output_field": "emb"}]}}])
    # a completion-registered model id produces strings
    register_completion("shout", lambda prompts: [p.upper() for p in prompts])
    out3 = run_pipeline(df, [{"inference": {
        "model_id": "shout",
        "input_output": [{"input_field": "text", "output_field": "reply"}]}}])
    assert [r.reply for r in out3.collect()] == ["HELLO WORLD", "OTHER TEXT"]


def test_grok_backslash_patterns_regression(spark):
    # WORD/NUMBER/IP/NOTSPACE carried doubled backslashes that reached the
    # java regex engine verbatim and never matched (Column API patterns are
    # data, not SQL text)
    df = spark.createDataFrame([("GET 42 10.1.2.3 tok-en",)], "s string")
    out = run_pipeline(df, [{"grok": {
        "field": "s",
        "patterns": ["%{WORD:verb} %{INT:n} %{IP:addr} %{NOTSPACE:tok}"]}}])
    r = out.collect()[0]
    assert (r.verb, r.n, r.addr, r.tok) == ("GET", "42", "10.1.2.3", "tok-en")


def test_redact_processor(spark):
    df = spark.createDataFrame(
        [("user bob@example.com logged in from 10.1.2.3",)], "msg string")
    out = run_pipeline(df, [{"redact": {
        "field": "msg",
        "patterns": ["%{EMAILADDRESS:email}", "%{IP:client}"]}}])
    assert out.collect()[0].msg == "user <email> logged in from <client>"
    # custom prefix/suffix + pattern_definitions
    out2 = run_pipeline(df, [{"redact": {
        "field": "msg", "prefix": "[", "suffix": "]",
        "pattern_definitions": {"USER": r"\buser \w+"},
        "patterns": ["%{USER:who}"]}}])
    assert out2.collect()[0].msg == "[who]@example.com logged in from 10.1.2.3"


def test_redact_dollar_prefix(spark):
    df = spark.createDataFrame([("from 10.1.2.3",)], "msg string")
    out = run_pipeline(df, [{"redact": {
        "field": "msg", "prefix": "$", "suffix": "$",
        "patterns": ["%{IP:ip}"]}}])
    assert out.collect()[0].msg == "from $ip$"


def test_sort_and_fail_processors(spark):
    df = spark.createDataFrame([([3, 1, 2], 1), ([5, 4], 2)], "a array<int>, id int")
    out = run_pipeline(df, [{"sort": {"field": "a"}}]).orderBy("id").collect()
    assert out[0]["a"] == [1, 2, 3] and out[1]["a"] == [4, 5]
    ok = run_pipeline(df, [{"fail": {"if": "id > 99", "message": "boom"}}])
    assert ok.count() == 2  # condition never trips
    import pyspark.errors

    bad = run_pipeline(df, [{"fail": {"if": "id > 1", "message": "boom"}}])
    with pytest.raises(Exception, match="boom"):
        bad.count()


def test_date_index_name_processor(spark):
    df = spark.createDataFrame(
        [("2024-03-15T10:22:33",)], "ts string")
    out = run_pipeline(df, [{"date_index_name": {
        "field": "ts", "date_formats": ["yyyy-MM-dd'T'HH:mm:ss"],
        "index_name_prefix": "logs-", "date_rounding": "M",
        "index_name_format": "yyyy-MM"}}]).collect()[0]
    assert out["_index"] == "logs-2024-03"


def test_registered_domain_processor(spark):
    df = spark.createDataFrame(
        [("www.example.co.uk",), ("example.com",)], "host string")
    rows = run_pipeline(df, [{"registered_domain": {
        "field": "host", "target_field": "url"}}]).collect()
    a = {r["host"]: r for r in rows}
    r1 = a["www.example.co.uk"]
    assert r1["url.registered_domain"] == "example.co.uk"
    assert r1["url.top_level_domain"] == "co.uk"
    assert r1["url.subdomain"] == "www"
    r2 = a["example.com"]
    assert r2["url.registered_domain"] == "example.com"
    assert r2["url.top_level_domain"] == "com"
    assert r2["url.subdomain"] is None


def test_network_direction_processor(spark):
    df = spark.createDataFrame(
        [("10.0.0.1", "10.0.0.2"), ("10.0.0.1", "8.8.8.8"),
         ("8.8.8.8", "10.0.0.1"), ("8.8.8.8", "1.1.1.1")],
        "source_ip string, destination_ip string")
    rows = run_pipeline(df, [{"network_direction": {
        "internal_networks": ["private"]}}]).collect()
    got = {(r["source_ip"], r["destination_ip"]): r["network_direction"] for r in rows}
    assert got[("10.0.0.1", "10.0.0.2")] == "internal"
    assert got[("10.0.0.1", "8.8.8.8")] == "outbound"
    assert got[("8.8.8.8", "10.0.0.1")] == "inbound"
    assert got[("8.8.8.8", "1.1.1.1")] == "external"


def test_community_id_processor(spark):
    # the published corelight/community-id-spec test vector
    df = spark.createDataFrame(
        [("128.232.110.120", "66.35.250.204", 34855, 80, 6)],
        "source_ip string, destination_ip string, source_port int, "
        "destination_port int, iana_number int")
    out = run_pipeline(df, [{"community_id": {}}]).collect()[0]
    assert out["community_id"] == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    # order-invariance: the reversed flow hashes identically
    df2 = spark.createDataFrame(
        [("66.35.250.204", "128.232.110.120", 80, 34855, 6)],
        "source_ip string, destination_ip string, source_port int, "
        "destination_port int, iana_number int")
    out2 = run_pipeline(df2, [{"community_id": {}}]).collect()[0]
    assert out2["community_id"] == out["community_id"]


def test_user_agent_processor(spark):
    from elasticsearch_spark.sources.ingest_pipeline import run_pipeline

    uas = [
        ("Mozilla/5.0 (Macintosh; Intel Mac OS X 10_10_5) AppleWebKit/537.36"
         " (KHTML, like Gecko) Chrome/51.0.2704.103 Safari/537.36",),
        ("Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:109.0)"
         " Gecko/20100101 Firefox/115.0",),
        ("Mozilla/5.0 (iPhone; CPU iPhone OS 16_5 like Mac OS X)"
         " AppleWebKit/605.1.15 (KHTML, like Gecko) Version/16.5"
         " Mobile/15E148 Safari/604.1",),
        ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36"
         " (KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36 Edg/120.0.2210.91",),
        ("curl/8.4.0",),
        ("weird-agent/1.0",),
    ]
    df = spark.createDataFrame(uas, "agent string")
    out = run_pipeline(df, [{"user_agent": {"field": "agent"}}]).collect()
    r0 = out[0]  # Chrome on Mac (the ES docs example)
    assert r0["user_agent.name"] == "Chrome"
    assert r0["user_agent.version"] == "51.0.2704.103"
    assert r0["user_agent.os.name"] == "Mac OS X"
    assert r0["user_agent.os.version"] == "10.10.5"
    assert r0["user_agent.os.full"] == "Mac OS X 10.10.5"
    assert r0["user_agent.device.name"] == "Mac"
    r1 = out[1]
    assert (r1["user_agent.name"], r1["user_agent.version"]) == ("Firefox", "115.0")
    assert (r1["user_agent.os.name"], r1["user_agent.os.version"]) == ("Windows", "10")
    r2 = out[2]
    assert r2["user_agent.name"] == "Mobile Safari"
    assert r2["user_agent.os.name"] == "iOS"
    assert r2["user_agent.os.version"] == "16.5"
    assert r2["user_agent.device.name"] == "iPhone"
    r3 = out[3]  # Edge UA also contains Chrome/ — vendor fork must win
    assert r3["user_agent.name"] == "Edge"
    assert r3["user_agent.version"] == "120.0.2210.91"
    r4 = out[4]
    assert (r4["user_agent.name"], r4["user_agent.version"]) == ("curl", "8.4.0")
    assert r4["user_agent.os.name"] == "Other"
    r5 = out[5]
    assert r5["user_agent.name"] == "Other"
    assert r5["user_agent.version"] is None
    assert r5["user_agent.original"] == "weird-agent/1.0"


def test_user_agent_properties_subset(spark):
    from elasticsearch_spark.sources.ingest_pipeline import run_pipeline

    df = spark.createDataFrame([("curl/8.0.1",)], "agent string")
    out = run_pipeline(df, [{"user_agent": {
        "field": "agent", "target_field": "ua", "properties": ["name"]}}])
    assert out.columns == ["agent", "ua.name"]
    assert out.collect()[0]["ua.name"] == "curl"


def test_if_conditional_on_unconditional_processors(spark):
    """Processors that write columns unconditionally (date, csv, rename,
    fingerprint, ...) must still honor the per-processor `if`
    (ConditionalProcessor.java): non-matching documents pass through
    untouched."""
    from elasticsearch_spark.sources.ingest_pipeline import run_pipeline

    df = spark.createDataFrame(
        [("epoch", "1700000000", "a,b"), ("iso", "1700000000", "c,d")],
        "fmt string, t string, pair string")
    out = run_pipeline(df, [
        {"date": {"field": "t", "formats": ["UNIX"], "if": "fmt = 'epoch'"}},
        {"csv": {"field": "pair", "target_fields": ["p1", "p2"],
                 "if": "fmt = 'epoch'"}},
        {"rename": {"field": "pair", "target_field": "renamed",
                    "if": "fmt = 'epoch'"}},
    ])
    rows = {r["fmt"]: r for r in out.collect()}
    assert rows["epoch"]["@timestamp"] is not None
    assert rows["iso"]["@timestamp"] is None          # untouched
    assert rows["epoch"]["p1"] == "a" and rows["iso"]["p1"] is None
    assert rows["epoch"]["renamed"] == "a,b" and rows["epoch"]["pair"] is None
    assert rows["iso"]["pair"] == "c,d" and rows["iso"]["renamed"] is None
