"""EQL — Event Query Language (the reference's ``x-pack/plugin/eql``).

Subset grammar (the shapes that cover the overwhelming share of real EQL
usage — threat-hunting style event correlation):

- simple query:      ``<category> where <condition>``
- sequence:          ``sequence [by f1[, f2]] [with maxspan=<n><unit>]
                       [cat1 where c1] [cat2 where c2] ...`` — steps may be
                       missing-events constraints ``![cat where c]``
                       (leading/interior/trailing; maxspan required)
- pipes:             ``| head N`` · ``| tail N`` · ``| unique field``

Conditions are EQL boolean expressions; ``==`` / ``!=`` / ``and`` / ``or``
/ ``not`` translate directly to Spark SQL (EQL's Painless-free predicate
subset IS a SQL expression).

Sequence semantics (documented subset): for every step-1 event, the GREEDY
MINIMAL chain — each later step binds to its category's earliest event
strictly after the previous step, same ``by`` key, and the whole chain
must fit in ``maxspan``. One output row per matched leading event
(overlapping chains allowed — the reference's state machine additionally
consumes events; the greedy-minimal subset is deterministic and
SQL-mirrorable, which is what the DuckDB oracle checks).

Execution: each step is a filtered scan; step i+1 is an as-of-style join
on the ``by`` key (shuffle co-partitioned by key — the one join key EQL
guarantees) + ``min_by`` aggregation for the earliest successor. No
window over the global timeline, no driver loops — survives 10^12 events
per category as long as per-key fan-out is bounded (skewed keys fall to
AQE skew handling like any other join).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEQ_RE = re.compile(
    r"^sequence(?:\s+by\s+(?P<by>[\w.,\s]+?))?(?:\s+with\s+maxspan=(?P<span>\d+)(?P<unit>ms|s|m|h|d))?\s*(?P<steps>!?\[.*)\s*$",
    re.S,
)
_SAMPLE_RE = re.compile(r"^sample\s+by\s+(?P<by>[\w.,\s]+?)\s*(?P<steps>\[.*)\s*$", re.S)
_STEP_RE = re.compile(
    r"(!?)\s*\[\s*([\w*]+)\s+where\s+(.*?)\s*\](?:\s+with\s+runs\s*=\s*(\d+))?", re.S
)
_SIMPLE_RE = re.compile(r"^\s*([\w*]+)\s+where\s+(.*?)\s*$", re.S)


def _col(df: DataFrame, name: str):
    """Column ref: a literal (possibly dotted) top-level column wins over
    struct access — dotted ECS keys like process.entity_id are routine."""
    return F.col(f"`{name}`") if name in df.columns else F.col(name)


def _safe_by(df: DataFrame, by: list[str]):
    """Alias non-identifier by keys to safe columns for joins/groupBys;
    returns (frame, safe names, {safe: original} to rename back)."""
    out, safe, back = df, [], {}
    for i, b in enumerate(by):
        if re.fullmatch(r"\w+", b):
            safe.append(b)
        else:
            a = f"__by_{i}"
            out = out.withColumn(a, _col(df, b))
            safe.append(a)
            back[a] = b
    return out, safe, back


_UNIT_S = {"ms": 0.001, "s": 1, "m": 60, "h": 3600, "d": 86400}


def _cond_to_sql(cond: str) -> str:
    """EQL condition → Spark SQL boolean expression, through the shared
    ES|QL dialect bridge (literal protection, ==, LIKE */? wildcard
    translation incl. pattern lists, anchored regex, cidr integer ranges).
    EQL-specific spellings normalize first: ``cidrMatch`` → cidr_match,
    ``wildcard(f, p…)`` → LIKE pattern list, ``stringContains``/
    ``indexOf`` (0-based, null when absent), case-insensitive ``like~`` /
    ``regex~`` (both sides lowered), ``regex`` → anchored RLIKE."""
    from .esql import _LIT_RE, _rewrite_call, _xlate

    # stash literals FIRST (same invariant as _xlate) so none of the
    # EQL-specific spellings below can rewrite string-literal content
    lits: list[str] = []

    def stash(m: re.Match) -> str:
        lits.append(m.group(0))
        return f"\x00{len(lits) - 1}\x00"

    out = _LIT_RE.sub(stash, cond)
    out = re.sub(r"\bcidrMatch\s*\(", "cidr_match(", out)
    out = _rewrite_call(
        out, "wildcard", lambda a: f"{a[0]} LIKE (" + ", ".join(a[1:]) + ")")
    out = _rewrite_call(
        out, "stringContains", lambda a: f"contains({a[0]}, {a[1]})")
    # `position` (not `locate`) so the ES|QL LOCATE arg-swap can't re-swap
    out = _rewrite_call(
        out, "indexOf", lambda a: f"nullif(position({a[1]}, {a[0]}) - 1, -1)")
    # EQL match(f, r1, r2, …) is ANCHORED-regex alternation (EQL spec) —
    # rewritten here so ES|QL's fulltext MATCH rewrite never sees it
    out = _rewrite_call(
        out, "match",
        lambda a: "(" + " OR ".join(f"{a[0]} RLIKE {p}" for p in a[1:]) + ")")

    # case-insensitive like~ / regex~: lower both sides (the literal
    # mutates in the stash; translation/anchoring happen later in _xlate)
    def ci_sub(m: re.Match) -> str:
        idx = int(m.group(3))
        q = lits[idx][0]
        lits[idx] = q + lits[idx][1:-1].lower() + q
        op = "LIKE" if m.group(2).lower().startswith("like") else "RLIKE"
        return f"lower({m.group(1)}) {op} \x00{idx}\x00"

    out = re.sub(r"(\S+)\s+(like~|regex~)\s+\x00(\d+)\x00", ci_sub, out)
    out = re.sub(r"(\S+)\s+regex\s+", r"\1 RLIKE ", out)
    # restore the (possibly lowered) literals and hand off to the shared
    # dialect bridge, which re-stashes and finishes the translation
    out = re.sub(r"\x00(\d+)\x00", lambda m: lits[int(m.group(1))], out)
    return _xlate(out)


def _split_pipes(q: str) -> tuple[str, list[tuple[str, str]]]:
    parts = [p.strip() for p in q.split("|")]
    pipes = []
    for p in parts[1:]:
        kw, _, arg = p.partition(" ")
        pipes.append((kw.strip(), arg.strip()))
    return parts[0], pipes


def eql_search(
    df: DataFrame,
    query: str,
    category_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str | None = None,
) -> DataFrame:
    """Run an EQL query over an events frame.

    Simple queries return matching event rows. Sequences return one row
    per matched chain: the ``by`` keys plus ``t1..tN`` (per-step
    timestamps, ordered)."""
    body, pipes = _split_pipes(query)

    def apply_pipes(out: DataFrame, order_names: list[str]) -> DataFrame:
        for kw, arg in pipes:
            if kw == "head":
                out = out.orderBy(*[_col(out, n_).asc() for n_ in order_names]).limit(int(arg))
            elif kw == "tail":
                out = out.orderBy(*[_col(out, n_).desc() for n_ in order_names]).limit(int(arg))
            elif kw == "unique":
                # UniquePipe keeps the FIRST row per value in result order —
                # dropDuplicates keeps an arbitrary one per partition layout
                from pyspark.sql import Window

                flds = [a.strip() for a in arg.split(",") if a.strip()]
                w_u = Window.partitionBy(*[_col(out, x) for x in flds]).orderBy(
                    *[_col(out, n_).asc() for n_ in order_names])
                out = (
                    out.withColumn("__uq", F.row_number().over(w_u))
                    .where(F.col("__uq") == 1).drop("__uq")
                )
            elif kw == "count":
                # `| count` (CountPipe): collapse to one row with the total
                out = out.agg(F.count("*").alias("count"))
            elif kw == "filter":
                # `| filter <expr>` (FilterPipe): post-match predicate
                out = out.where(F.expr(arg))
            elif kw == "sort":
                # `| sort f1[, f2]` (SortPipe): ascending field sort
                flds = [a.strip() for a in arg.split(",") if a.strip()]
                out = out.orderBy(*[_col(out, n_).asc() for n_ in flds])
            else:
                raise ValueError(f"unsupported EQL pipe: {kw}")
        return out

    # `until [cat where cond]` (Sequence.java until-clause): an until event
    # between a chain's first and last step discards the in-flight sequence
    until_step = None
    um = re.search(r"\buntil\s+(\[[^\]]*\])\s*$", body)
    if um:
        ((_neg, ucat_, ucond_, _runs),) = _STEP_RE.findall(um.group(1))
        until_step = (ucat_, ucond_)
        body = body[: um.start()].rstrip()

    # `sample by key [s1] [s2] …` (x-pack/plugin/eql Sample.java, 8.6+):
    # keys having at least one event per step, NO temporal ordering; this
    # subset reports the earliest event per (key, step) — deterministic
    sm2 = _SAMPLE_RE.match(body.strip())
    if sm2:
        by_orig = [b.strip() for b in sm2.group("by").split(",") if b.strip()]
        src, by, back = _safe_by(df, by_orig)
        steps = [(c, w) for _neg, c, w, _ in _STEP_RE.findall(sm2.group("steps"))]
        if len(steps) < 2:
            raise ValueError("sample needs at least two steps")
        cur = None
        for i, (cat, cond) in enumerate(steps):
            out = src
            if cat not in ("*", "any"):
                out = out.where(F.col(category_col) == cat)
            if cond and cond.strip() not in ("true",):
                out = out.where(F.expr(_cond_to_sql(cond)))
            stepf = out.groupBy(*by).agg(F.min(ts_col).alias(f"t{i + 1}"))
            cur = stepf if cur is None else cur.join(stepf, by)
        for a, orig in back.items():
            cur = cur.withColumnRenamed(a, orig)
        names = by_orig + ["t1"]
        return apply_pipes(cur.orderBy(*[_col(cur, n_).asc() for n_ in names]), names)

    m = _SEQ_RE.match(body.strip())
    if not m:
        sm = _SIMPLE_RE.match(body.strip())
        if not sm:
            raise ValueError(f"cannot parse EQL query: {query!r}")
        cat, cond = sm.groups()
        out = df
        if cat != "*" and cat != "any":
            out = out.where(F.col(category_col) == cat)
        out = out.where(F.expr(_cond_to_sql(cond)))
        # EQL result order: timestamp, then the tiebreaker id field
        tie = id_col or ("event_id" if "event_id" in df.columns else None)
        names = [ts_col] + ([tie] if tie else [])
        return apply_pipes(out.orderBy(*[F.col(n_).asc() for n_ in names]), names)

    by_orig = [b.strip() for b in (m.group("by") or "").split(",") if b.strip()]
    df, by, back = _safe_by(df, by_orig)
    span_s = (
        int(m.group("span")) * _UNIT_S[m.group("unit")] if m.group("span") else None
    )
    # `with runs=N` (SequenceQuery runs): the step repeats N times;
    # `![cat where cond]` marks a MISSING-events step (8.x missing events)
    steps_all = [
        (c, w, neg == "!")
        for neg, c, w, runs in _STEP_RE.findall(m.group("steps"))
        for _ in range(int(runs) if runs else 1)
    ]
    # missing steps are verification constraints on the chain of regular
    # steps: record each as (count of regular steps before it, cat, cond)
    missing_slots: list[tuple[int, str, str]] = []
    steps: list[tuple[str, str]] = []
    for cat_, cond_, is_missing in steps_all:
        if is_missing:
            missing_slots.append((len(steps), cat_, cond_))
        else:
            steps.append((cat_, cond_))
    if missing_slots and span_s is None:
        # the reference requires maxspan for missing-events sequences
        # (head/tail windows are otherwise unbounded)
        raise ValueError("sequences with missing events require maxspan")
    if len(steps) < (1 if missing_slots else 2):
        raise ValueError("sequence needs at least two steps")
    if not by:
        raise ValueError("sequence requires `by` in this subset")

    def step_frame(i: int, cat: str, cond: str) -> DataFrame:
        out = df
        if cat not in ("*", "any"):
            out = out.where(F.col(category_col) == cat)
        if cond and cond.strip() not in ("true",):
            out = out.where(F.expr(_cond_to_sql(cond)))
        cols = [F.col(b) for b in by] + [F.col(ts_col).alias(f"t{i + 1}")]
        return out.select(*cols)

    cur = step_frame(0, *steps[0])
    for i, (cat, cond) in enumerate(steps[1:], start=1):
        nxt = step_frame(i, cat, cond)
        prev_t = f"t{i}"
        this_t = f"t{i + 1}"
        joined = cur.join(nxt, by).where(F.col(this_t) > F.col(prev_t))
        chain_cols = by + [f"t{j + 1}" for j in range(i)]
        # earliest successor per chain (greedy minimal chain)
        cur = joined.groupBy(*chain_cols).agg(F.min(this_t).alias(this_t))
    if span_s is not None:
        # microsecond arithmetic: whole-second timestampdiff would admit
        # chains up to 999 ms past a sub-second maxspan
        last = f"t{len(steps)}"
        span_us = int(span_s * 1_000_000)
        cur = cur.where(F.expr(f"timestampdiff(MICROSECOND, t1, {last})") <= span_us)
    if until_step is not None:
        ucat, ucond = until_step
        u = df
        if ucat not in ("*", "any"):
            u = u.where(F.col(category_col) == ucat)
        if ucond and ucond.strip() not in ("true",):
            u = u.where(F.expr(_cond_to_sql(ucond)))
        u = u.select(*[F.col(b) for b in by], F.col(ts_col).alias("__tu"))
        last = f"t{len(steps)}"
        # chains are keyed by (by, t1) — greedy-min made t1 unique per chain
        bad = (
            cur.join(u, by)
            .where((F.col("__tu") > F.col("t1")) & (F.col("__tu") < F.col(last)))
            .select(*by, "t1")
            .distinct()
        )
        cur = cur.join(bad, by + ["t1"], "left_anti")
    # missing-events verification (x-pack/plugin/eql missing events, 8.x):
    # an interior `![...]` step between regular steps j and j+1 requires NO
    # matching event strictly inside (t_j, t_{j+1}); a leading one requires
    # none in (t1 − maxspan, t1); a trailing one none in (t_last, t1 +
    # maxspan] — the reference closes trailing sequences when maxspan
    # elapses after the sequence start. Each check is one by-key equi-join
    # + range predicate + anti-join — same shuffle shape as `until`.
    n_reg = len(steps)
    for j, mcat, mcond in missing_slots:
        u = df
        if mcat not in ("*", "any"):
            u = u.where(F.col(category_col) == mcat)
        if mcond and mcond.strip() not in ("true",):
            u = u.where(F.expr(_cond_to_sql(mcond)))
        u = u.select(*[F.col(b) for b in by], F.col(ts_col).alias("__tm"))
        span_expr = f"make_interval(0, 0, 0, 0, 0, 0, {span_s})"
        if j == 0:
            rng = (
                F.col("__tm") > F.expr(f"t1 - {span_expr}")
            ) & (F.col("__tm") < F.col("t1"))
        elif j == n_reg:
            rng = (F.col("__tm") > F.col(f"t{n_reg}")) & (
                F.col("__tm") <= F.expr(f"t1 + {span_expr}")
            )
        else:
            rng = (F.col("__tm") > F.col(f"t{j}")) & (
                F.col("__tm") < F.col(f"t{j + 1}")
            )
        bad = cur.join(u, by).where(rng).select(*by, "t1").distinct()
        cur = cur.join(bad, by + ["t1"], "left_anti")
    for a, orig in back.items():
        cur = cur.withColumnRenamed(a, orig)
    names = by_orig + ["t1"]
    return apply_pipes(cur.orderBy(*[_col(cur, n_).asc() for n_ in names]), names)
