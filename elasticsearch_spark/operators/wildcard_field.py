"""Wildcard field mapper (x-pack/plugin/wildcard, ``WildcardFieldMapper.java``):
ngram-accelerated wildcard matching over machine-generated strings (log
lines, paths, urls) — the field type you use when leading-wildcard queries
must not scan every raw value.

Reference design (``WildcardFieldMapper.java:86-120,246-340``): the stored
value is lowercased and wrapped in sentinel chars (one ``\\0`` at the start,
two at the end — ``TOKEN_START_OR_END_CHAR``), tokenized into 3-grams
(``NGRAM_SIZE = 3``), and queries run in two phases:

1. APPROXIMATION over the ngram index — each literal fragment of the
   pattern contributes its 3-grams as MUST clauses, so only values
   containing ALL required grams become candidates;
2. exact VERIFICATION of each candidate against the original value
   (``BinaryDvConfirmedAutomatonQuery``) — the approximation can overmatch
   (grams may occur out of order) but never undermatch.

Spark-first shape: the gram index is one explode + per-row dedup, written
range-partitioned and sorted by gram so ``gram IN (...)`` becomes a
row-group skip-scan; the candidate set is a ``groupBy(id) HAVING count(*)
== n_grams`` over ONLY the probed grams' posting rows; verification is a
semi-join back to the source rows plus a JVM-side ``LIKE``. At 10^12 docs
the thing you cannot afford is the raw-string scan — the probe touches the
posting rows of at most ``MAX_PROBE_GRAMS`` grams, and the verify touches
only candidates.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NGRAM_SIZE = 3
# clause cap — the reference caps approximation clauses (getNgramTokens
# keeps up to 4 evenly-spaced grams per fragment); we keep more (verify is
# exact either way, more grams = tighter candidates) but still bound the
# IN-list so the parquet filter stays small.
MAX_PROBE_GRAMS = 32

_START = "\x00"      # TOKEN_START_STRING
_END = "\x00\x00"    # TOKEN_END_STRING


def _wrapped(col) -> "F.Column":
    """Lowercase + sentinel wrap, the exact indexed form of a value."""
    return F.concat(F.lit(_START), F.lower(col), F.lit(_END))


def build_wildcard_index(
    df: DataFrame,
    id_col: str,
    field: str,
    out_dir: str,
    num_files: int = 8,
) -> None:
    """Write the (gram, id) posting table for ``field``.

    One narrow projection + explode of per-row-distinct 3-grams (JVM
    higher-order functions, no Python), then a range repartition on gram +
    in-partition sort: every query gram lands in one file and one run of
    row groups, so the ``gram IN (...)`` probe is a skip-scan, not a full
    read. The explode is the only wide op and it is map-side until the
    final range exchange.
    """
    grams = (
        df.select(F.col(id_col).alias("id"), _wrapped(F.col(field)).alias("w"))
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, char_length(w) - {NGRAM_SIZE - 1}),"
                        f" i -> substring(w, i, {NGRAM_SIZE}))"
                    )
                )
            ).alias("gram"),
        )
    )
    (
        grams.repartitionByRange(num_files, "gram")
        .sortWithinPartitions("gram")
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def pattern_fragments(pattern: str) -> list[str]:
    """Literal fragments of a wildcard pattern, in indexed (wrapped) form.

    ``*error*Critical?path*`` → fragments of ``\\0*error*critical?path*\\0\\0``
    split on wildcard runs → ``['\\0', 'error', 'critical', 'path', '\\0\\0']``
    (sub-ngram fragments are kept here; the gram probe drops what it cannot
    use). Mirrors the reference's fragment walk over ``ngramIndexPattern``
    (``WildcardFieldMapper.java:282-333``)."""
    wrapped = _START + pattern.lower() + _END
    return [f for f in re.split(r"[*?]+", wrapped) if f]


def probe_grams(pattern: str) -> list[str]:
    """The MUST-clause gram set for a pattern (empty ⇒ not accelerable,
    caller falls back to the verify-only scan). Longest fragments first so
    the ``MAX_PROBE_GRAMS`` cap keeps the most selective clauses."""
    grams: list[str] = []
    seen = set()
    for frag in sorted(pattern_fragments(pattern), key=len, reverse=True):
        for i in range(len(frag) - NGRAM_SIZE + 1):
            g = frag[i : i + NGRAM_SIZE]
            if g not in seen:
                seen.add(g)
                grams.append(g)
    return grams[:MAX_PROBE_GRAMS]


def like_pattern(pattern: str) -> str:
    """ES wildcard → SQL LIKE: ``*`` → ``%``, ``?`` → ``_``, with literal
    ``%``/``_``/``\\`` escaped (LIKE's default backslash escape)."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def verify_predicate(field: str, pattern: str) -> "F.Column":
    """The exact (case-insensitive) wildcard match — phase-2 verification,
    also the standalone fallback when no fragment reaches NGRAM_SIZE. The
    index stores lowercased values, so both sides lowercase here (the
    reference's ``case_insensitive=true`` mode; its normalizer-less
    case-sensitive mode is not offered — one behavior, stated)."""
    return F.lower(F.col(field)).like(like_pattern(pattern.lower()))


def wildcard_field_search(
    spark: SparkSession,
    index_dir: str,
    data: DataFrame,
    id_col: str,
    field: str,
    pattern: str,
) -> DataFrame:
    """Two-phase wildcard query over a built gram index.

    Phase 1 reads only the probed grams' rows (parquet filter pushdown on
    the sorted gram column) and keeps ids containing ALL of them; phase 2
    semi-joins the candidates and applies the exact LIKE. Patterns with no
    fragment of length >= NGRAM_SIZE (e.g. ``a?b``) cannot be accelerated —
    the reference runs those as verification-only automaton queries — so we
    return the verify-only scan, loudly in the plan rather than silently
    building a useless probe."""
    grams = probe_grams(pattern)
    if not grams:
        return data.where(verify_predicate(field, pattern))
    idx = spark.read.parquet(index_dir).where(F.col("gram").isin(grams))
    cands = (
        idx.groupBy("id")
        .agg(F.count("*").alias("ng"))  # (gram,id) rows are per-row distinct
        .where(F.col("ng") == len(grams))
        .select(F.col("id").alias(id_col))
    )
    # small candidate sets become a PUSHABLE id predicate — the data scan
    # then prunes parquet row groups and the LIKE touches only candidate
    # rows, instead of the whole corpus paying the verify during the scan.
    # Large sets fall back to the semi-join (Catalyst's runtime bloom
    # filter still narrows the scan).
    head = [r[0] for r in cands.limit(10_001).collect()]
    if len(head) <= 10_000:
        pruned = data.where(F.col(id_col).isin(head)) if head else data.limit(0)
    else:
        pruned = data.join(cands, on=id_col, how="left_semi")
    return pruned.where(verify_predicate(field, pattern))
