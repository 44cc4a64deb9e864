"""EQL subset (plans/eql.py): simple queries, sequences, pipes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from elasticsearch_spark.plans.eql import eql_search


@pytest.fixture(scope="module")
def events(spark):
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        # user 1: login → access → exfil within 30 min (full chain)
        (1, 1, "login", base, 0.0),
        (2, 1, "access", base + dt.timedelta(minutes=10), 5.0),
        (3, 1, "exfil", base + dt.timedelta(minutes=25), 9.0),
        # user 2: login → access but exfil far outside maxspan
        (4, 2, "login", base, 0.0),
        (5, 2, "access", base + dt.timedelta(minutes=5), 1.0),
        (6, 2, "exfil", base + dt.timedelta(hours=5), 2.0),
        # user 3: events out of order (access before login) → no chain
        (7, 3, "access", base, 1.0),
        (8, 3, "login", base + dt.timedelta(minutes=1), 0.0),
        # user 1 second login → earliest later access binds greedily
        (9, 1, "login", base + dt.timedelta(minutes=5), 0.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).cache()


def test_simple_query_and_pipes(events):
    out = eql_search(events, 'login where value == 0.0 | head 2').collect()
    assert [r["event_id"] for r in out] == [1, 4]
    out2 = eql_search(events, "access where value > 0 | unique user_id").collect()
    assert len(out2) == 3
    out3 = eql_search(events, "* where value >= 9.0").collect()
    assert [r["event_id"] for r in out3] == [3]


def test_sequence_with_maxspan(events):
    q = ("sequence by user_id with maxspan=30m "
         "[login where true] [access where true] [exfil where true]")
    rows = eql_search(events, q).collect()
    # only user 1's chain fits in 30 minutes; the second login (10:05)
    # greedily binds access@10:10 and exfil@10:25 → two leading events
    assert {r["user_id"] for r in rows} == {1}
    assert len(rows) == 2
    for r in rows:
        assert r["t1"] < r["t2"] < r["t3"]


def test_sequence_without_span_and_order(events):
    q = "sequence by user_id [login where true] [access where true]"
    rows = eql_search(events, q).collect()
    # user 2 qualifies now; user 3 never (access precedes login)
    assert {r["user_id"] for r in rows} == {1, 2}


def test_sequence_greedy_minimal(events):
    q = "sequence by user_id [login where true] [exfil where true]"
    rows = eql_search(events, q, ).collect()
    u1 = [r for r in rows if r["user_id"] == 1]
    # both user-1 logins chain to the SAME earliest exfil (greedy minimal)
    assert len(u1) == 2
    assert all(r["t2"] == u1[0]["t2"] for r in u1)


def test_tail_pipe_and_ms_maxspan(events, spark):
    import datetime as dt

    out = eql_search(events, "login where value == 0.0 | tail 2").collect()
    # tail = last 2 by (ts, event_id) descending
    assert {r["event_id"] for r in out} == {9, 8}
    base = dt.datetime(2024, 1, 1)
    fine = spark.createDataFrame(
        [(1, 10, "a", base, 0.0),
         (2, 10, "b", base + dt.timedelta(milliseconds=900), 0.0),
         (3, 11, "a", base, 0.0),
         (4, 11, "b", base + dt.timedelta(milliseconds=300), 0.0)],
        "event_id long, user_id long, event_type string, ts timestamp, value double",
    )
    q = "sequence by user_id with maxspan=500ms [a where true] [b where true]"
    rows = eql_search(fine, q).collect()
    # 900ms chain must NOT match a 500ms window; 300ms chain must
    assert {r["user_id"] for r in rows} == {11}


def test_sequence_until(spark):
    import datetime as dt2

    base = dt2.datetime(2024, 2, 1, 9, 0, 0)
    rows = [
        # user 1: login → exfil, NO logout between → chain survives
        (1, 1, "login", base),
        (2, 1, "exfil", base + dt2.timedelta(minutes=20)),
        # user 2: login → logout → exfil: until kills the chain
        (3, 2, "login", base),
        (4, 2, "logout", base + dt2.timedelta(minutes=5)),
        (5, 2, "exfil", base + dt2.timedelta(minutes=20)),
        # user 3: logout AFTER the chain completes → unaffected
        (6, 3, "login", base),
        (7, 3, "exfil", base + dt2.timedelta(minutes=10)),
        (8, 3, "logout", base + dt2.timedelta(minutes=30)),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp"
    )
    out = eql_search(
        ev,
        "sequence by user_id [login where true] [exfil where true] until [logout where true]",
    ).collect()
    assert sorted(r.user_id for r in out) == [1, 3]
    # without until, user 2's chain matches too
    out2 = eql_search(
        ev, "sequence by user_id [login where true] [exfil where true]"
    ).collect()
    assert sorted(r.user_id for r in out2) == [1, 2, 3]


def test_sequence_with_runs(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        # host A: login, fail, fail, alert → matches [login][fail with runs=2][alert]
        ("A", "login", base),
        ("A", "fail", base + dt.timedelta(seconds=1)),
        ("A", "fail", base + dt.timedelta(seconds=2)),
        ("A", "alert", base + dt.timedelta(seconds=3)),
        # host B: only one fail → no match
        ("B", "login", base),
        ("B", "fail", base + dt.timedelta(seconds=1)),
        ("B", "alert", base + dt.timedelta(seconds=2)),
    ]
    df = spark.createDataFrame(rows, "host string, event_type string, ts timestamp")
    out = eql_search(
        df,
        'sequence by host [login where true] [fail where true] with runs=2 [alert where true]',
    ).collect()
    assert [r.host for r in out] == ["A"]


def test_sample_command(spark):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("A", "scan", base + dt.timedelta(seconds=5)),
        ("A", "exfil", base),          # order does NOT matter for sample
        ("B", "scan", base),           # B has no exfil → excluded
        ("C", "exfil", base),          # C has no scan → excluded
    ]
    df = spark.createDataFrame(rows, "host string, event_type string, ts timestamp")
    out = eql_search(df, "sample by host [scan where true] [exfil where true]").collect()
    assert [r.host for r in out] == ["A"]
    assert out[0].t1 > out[0].t2  # no temporal constraint: t1 after t2 is fine


def test_pipes_count_filter_sort(spark):
    from elasticsearch_spark.plans.eql import eql_search

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "a", 50.0), (3, "b", 7.0), (4, "a", 70.0)],
        "event_id long, event_type string, value double",
    ).withColumn("ts", F.expr("timestamp_seconds(event_id)"))
    n = eql_search(df, 'any where event_type == "a" | count').collect()
    assert n[0]["count"] == 3
    rows = eql_search(
        df, 'any where event_type == "a" | filter value > 10 | sort value'
    ).collect()
    assert [r["event_id"] for r in rows] == [2, 4]


def test_sequence_missing_trailing(events):
    """`[access] ![exfil]`: access NOT followed by exfil within maxspan.
    user 1 exfils at +25m (inside 1h after t1=+10m) → excluded; user 2's
    exfil is 5h out (outside the window) → matches; user 3 has no exfil."""
    out = eql_search(
        events,
        "sequence by user_id with maxspan=1h [access where true] ![exfil where true]",
    ).collect()
    assert sorted(r["user_id"] for r in out) == [2, 3]


def test_sequence_missing_interior(events, spark):
    """`[login] ![access] [exfil]`: login → exfil with NO access between."""
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    extra = spark.createDataFrame(
        [(100, 9, "login", base, 0.0),
         (101, 9, "exfil", base + dt.timedelta(minutes=20), 1.0)],
        "event_id long, user_id long, event_type string, ts timestamp, value double")
    ev = events.unionByName(extra)
    out = eql_search(
        ev,
        "sequence by user_id with maxspan=1h"
        " [login where true] ![access where true] [exfil where true]",
    ).collect()
    # user 1's login→exfil chain has an access at +10m between → rejected;
    # user 9 is clean
    assert sorted(r["user_id"] for r in out) == [9]


def test_sequence_missing_leading(events, spark):
    """`![login] [exfil]`: exfil with no login in the prior maxspan."""
    base = dt.datetime(2024, 1, 1, 10, 0, 0)
    extra = spark.createDataFrame(
        [(102, 8, "exfil", base + dt.timedelta(hours=3), 1.0)],
        "event_id long, user_id long, event_type string, ts timestamp, value double")
    ev = events.unionByName(extra)
    out = eql_search(
        ev,
        "sequence by user_id with maxspan=30m"
        " ![login where true] [exfil where true]",
    ).collect()
    # user 1 exfil at +25m has a login at +5m (inside 30m before) → rejected;
    # user 2 exfil at +5h: logins were hours earlier → matches; user 8 clean
    assert sorted(r["user_id"] for r in out) == [2, 8]


def test_sequence_missing_requires_maxspan(events):
    with pytest.raises(ValueError, match="missing events require maxspan"):
        eql_search(events, "sequence by user_id [access where true] ![exfil where true]")


def test_eql_condition_dialect_bridge(spark):
    from elasticsearch_spark.plans.eql import _cond_to_sql, eql_search

    assert _cond_to_sql('p == "x"') == "p = 'x'"
    assert _cond_to_sql('name like "ad*"') == "name like 'ad%'"
    assert "LIKE 'ad%'" in _cond_to_sql('wildcard(name, "ad*", "ba?")')
    assert _cond_to_sql('name like~ "AD*"') == "lower(name) LIKE 'ad%'"
    assert _cond_to_sql('name regex "ab."') == "name RLIKE '^(?:ab.)$'"
    assert "BETWEEN" in _cond_to_sql('cidrMatch(ip, "10.0.0.0/8")')
    import datetime
    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(base, "proc", "admin.exe", "10.1.2.3", 1),
         (base, "proc", "Adduser.EXE", "192.168.0.9", 2),
         (base, "proc", "bash", "10.9.9.9", 3)],
        "ts timestamp, event_type string, name string, ip string, event_id long")
    out = eql_search(df, 'proc where name like~ "AD*" and cidrMatch(ip, "10.0.0.0/8")')
    assert [r.event_id for r in out.collect()] == [1]
    out2 = eql_search(df, 'proc where wildcard(name, "b*", "z*")')
    assert [r.event_id for r in out2.collect()] == [3]
    out3 = eql_search(df, 'proc where indexOf(name, "mi") == 2')
    assert [r.event_id for r in out3.collect()] == [1]


def test_eql_bridge_literal_safety_and_match(spark):
    from elasticsearch_spark.plans.eql import _cond_to_sql, eql_search

    # literal content is protected from operator/function rewrites
    assert _cond_to_sql('cmd == "run regex test"') == "cmd = 'run regex test'"
    assert _cond_to_sql('cmd == "wildcard(a, b)"') == "cmd = 'wildcard(a, b)'"
    # EQL match() is ANCHORED regex alternation, not fulltext
    assert _cond_to_sql('match(name, "ad.*")') == "(name RLIKE '^(?:ad.*)$')"
    import datetime
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1), "proc", "admin.exe", 1),
         (datetime.datetime(2024, 1, 1), "proc", "bash", 2)],
        "ts timestamp, event_type string, name string, event_id long")
    out = eql_search(df, 'proc where match(name, "ad.*")')
    assert [r.event_id for r in out.collect()] == [1]


def test_unique_pipe_keeps_first_in_order(spark):
    """`| unique f` keeps the FIRST event per value in result order —
    dropDuplicates kept an arbitrary row per partition layout."""
    base = dt.datetime(2024, 3, 1)
    rows = [(i, i % 3, "e", base + dt.timedelta(seconds=i), 0.0)
            for i in range(30)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
    ).repartition(8)
    out = eql_search(df, "e where true | unique user_id").collect()
    assert sorted(r["event_id"] for r in out) == [0, 1, 2]  # earliest per user


def test_sequence_by_dotted_field(spark):
    """Dotted ECS-style by keys (process.entity_id) parse and group."""
    base = dt.datetime(2024, 3, 1)
    rows = [
        ("k1", 1, "login", base, 0.0),
        ("k1", 2, "exfil", base + dt.timedelta(minutes=1), 0.0),
        ("k2", 3, "login", base, 0.0),
    ]
    df = spark.createDataFrame(
        rows,
        "`process.entity_id` string, event_id long, event_type string, ts timestamp, value double",
    )
    out = eql_search(
        df, "sequence by process.entity_id with maxspan=10m "
            "[login where true] [exfil where true]").collect()
    assert [r["process.entity_id"] for r in out] == ["k1"]
