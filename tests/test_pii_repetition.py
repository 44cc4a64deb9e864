"""PII scan/redaction and Gopher-style repetition signals."""

from __future__ import annotations

from pyspark.sql import functions as F

from elasticsearch_spark.functions import textstats


def test_pii_signals_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+spam@sub.example.co.uk or call +1(555)123-4567"),
            (2, "server 192.168.0.1 ssn 123-45-6789 and 10.0.0.255"),
            (3, "no pii here, just 3.14 and v1.2 words"),
        ],
        "id long, t string",
    )
    out = {r["id"]: r for r in df.select(
        "id", *textstats.pii_signals("t"), textstats.redact_pii("t")
    ).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"]) == (1, 1)
    assert (out[2]["n_ipv4"], out[2]["n_ssn"]) == (2, 1)
    assert (out[3]["n_email"], out[3]["n_ssn"], out[3]["n_ipv4"], out[3]["n_phone"]) == (0, 0, 0, 0)
    assert out[1]["redacted"] == "mail me at <EMAIL> or call <PHONE>"
    assert out[2]["redacted"] == "server <IP> ssn <SSN> and <IP>"
    assert out[3]["redacted"] == out[3]["redacted"]  # unchanged text survives
    # version strings / decimals are not IPs
    assert "<IP>" not in out[3]["redacted"]


def test_repetition_signals_exact(spark):
    # 4 non-empty lines, "dup" twice (len 3 each); tokens: a b a b a -> bigrams
    # [a b, b a, a b, b a]: top freq 2/4
    text = "dup\ndup\n\nsolo line\nother\na b a b a"
    df = spark.createDataFrame([(1, text)], "id long, t string")
    r = df.select(*textstats.repetition_signals("t")).collect()[0]
    # lines: dup, dup, solo line, other, a b a b a -> 5 lines, 4 distinct
    assert abs(r["dup_line_frac"] - (1 - 4 / 5)) < 1e-9
    total_chars = 3 + 3 + len("solo line") + len("other") + len("a b a b a")
    assert abs(r["dup_line_char_frac"] - 6 / total_chars) < 1e-9
    # bigrams over all tokens of the whole text, top bigram = "a b" (2) or
    # "b a" (2); denominator = n_tokens - 1
    toks = "dup dup solo line other a b a b a".split()
    n_bg = len(toks) - 1
    assert abs(r["top_bigram_frac"] - 2 / n_bg) < 1e-9


def test_repetition_empty_and_single(spark):
    df = spark.createDataFrame([(1, ""), (2, "one")], "id long, t string")
    rows = {r["id"]: r for r in df.select(
        "id", *textstats.repetition_signals("t")
    ).collect()}
    assert rows[1]["top_bigram_frac"] == 0.0
    assert rows[2]["dup_line_frac"] == 0.0
    assert rows[2]["dup_line_char_frac"] == 0.0


def test_normalize_url_cases(spark):
    from elasticsearch_spark.functions.textstats import normalize_url

    rows = [
        ("HTTPS://Example.COM:443/Path/Q?a=1&utm_source=x&b=2#frag",
         "https://example.com/Path/Q?a=1&b=2"),
        ("http://site.org:80/", "http://site.org"),
        ("http://a.net/p?utm_campaign=z", "http://a.net/p"),
        ("http://a.net/p?fbclid=only", "http://a.net/p"),
        ("http://a.net/p?keep=1&gclid=g&also=2", "http://a.net/p?keep=1&also=2"),
        ("https://ok.com/path", "https://ok.com/path"),  # untouched
        ("https://ok.com:8443/x", "https://ok.com:8443/x"),  # non-default port kept
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "url string")
    got = [r[0] for r in df.select(normalize_url("url")).collect()]
    assert got == [r[1] for r in rows]


def test_registrable_domain(spark):
    from elasticsearch_spark.functions.textstats import registrable_domain

    rows = [
        ("https://sub.deep.example.com/x", "example.com"),
        ("http://blog.example.co.uk/post", "example.co.uk"),
        ("http://example.org", "example.org"),
        ("http://localhost/x", "localhost"),
    ]
    df = spark.createDataFrame([(r[0],) for r in rows], "url string")
    got = [r[0] for r in df.select(registrable_domain("url")).collect()]
    assert got == [r[1] for r in rows]
