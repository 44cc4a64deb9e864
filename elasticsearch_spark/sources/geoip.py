"""geoip ingest processor support (``modules/ingest-geoip``,
``GeoIpProcessor.java``): IP → location attributes via a network-block
database (MaxMind-style: disjoint [net_lo, net_hi] ranges with attributes).

Spark shape: a broadcast RANGE join, made hash-joinable by bucketing —
``prepare_geoip_blocks`` splits every block at /8 boundaries so each row
lives inside ONE first-octet bucket, and the lookup joins on the equality
``bucket == first_octet`` with the range check as a residual filter. That
turns an O(rows × blocks) nested-loop range join into a BroadcastHashJoin
probing ≤ blocks/256 candidates per row — the shape that survives a 100 TB
scan (the block DB is a few MB broadcast once; no shuffle of the corpus).

No real GeoLite database ships in this sandbox, so ``fake_geoip_db``
provides a deterministic 512-block stand-in with the same schema; swap in
the real mmdb-exported table in production.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def ip_to_long(ip: Column) -> Column:
    """Dotted-quad IPv4 string → uint32 as long (NULL on malformed)."""
    o = F.split(ip, r"\.")
    # octet range must validate too: "1.2.3.999" would otherwise fold into
    # a number that can land inside a real block and geolocate garbage
    ok = ip.rlike(
        r"^(25[0-5]|2[0-4]\d|1?\d{1,2})(\.(25[0-5]|2[0-4]\d|1?\d{1,2})){3}$"
    )
    num = (
        o.getItem(0).cast("long") * F.lit(1 << 24)
        + o.getItem(1).cast("long") * F.lit(1 << 16)
        + o.getItem(2).cast("long") * F.lit(1 << 8)
        + o.getItem(3).cast("long")
    )
    return F.when(ok, num)


def prepare_geoip_blocks(blocks: DataFrame) -> DataFrame:
    """Split (net_lo, net_hi, attrs…) blocks at /8 boundaries and add the
    ``bucket`` equi-join key. Blocks are exploded over the /8 range they
    span (MaxMind city blocks rarely span more than one)."""
    b_lo = (F.col("net_lo") / F.lit(1 << 24)).cast("long")
    b_hi = (F.col("net_hi") / F.lit(1 << 24)).cast("long")
    out = blocks.withColumn("bucket", F.explode(F.sequence(b_lo, b_hi)))
    return out.withColumn(
        "net_lo", F.greatest(F.col("net_lo"), F.col("bucket") * F.lit(1 << 24))
    ).withColumn(
        "net_hi",
        F.least(F.col("net_hi"), (F.col("bucket") + 1) * F.lit(1 << 24) - 1),
    )


def geoip_lookup(
    df: DataFrame,
    ip_col: str,
    blocks: DataFrame,
    target_field: str = "geoip",
    properties: list[str] | None = None,
) -> DataFrame:
    """Left-join location attributes for ``ip_col`` under
    ``target_field.<attr>`` (a struct column, like the processor's JSON
    object). ``blocks`` must be ``prepare_geoip_blocks`` output."""
    attrs = properties or [
        c for c in blocks.columns if c not in ("net_lo", "net_hi", "bucket")
    ]
    db = blocks.select(
        F.col("bucket").alias("__g_bucket"),
        F.col("net_lo").alias("__g_lo"),
        F.col("net_hi").alias("__g_hi"),
        *[F.col(a).alias(f"__g_{a}") for a in attrs],
    )
    ipnum = ip_to_long(F.col(ip_col))
    probe = df.withColumn("__g_ip", ipnum).withColumn(
        "__g_probe", (F.col("__g_ip") / F.lit(1 << 24)).cast("long")
    )
    joined = probe.join(
        F.broadcast(db),
        (F.col("__g_probe") == F.col("__g_bucket"))
        & F.col("__g_ip").between(F.col("__g_lo"), F.col("__g_hi")),
        "left",
    )
    return joined.withColumn(
        target_field, F.struct(*[F.col(f"__g_{a}").alias(a) for a in attrs])
    ).drop(*[c for c in joined.columns if c.startswith("__g_")])


def fake_geoip_db(spark: SparkSession) -> DataFrame:
    """Deterministic 512-block stand-in database (two /9 halves per /8;
    country cycles mod 97) — the codec-gated fake for sandbox tests; the
    schema matches a MaxMind country export (net_lo, net_hi,
    country_iso_code)."""
    half = 1 << 23
    rows = []
    for b in range(256):
        lo = b << 24
        rows.append((lo, lo + half - 1, f"C{(2 * b) % 97}"))
        rows.append((lo + half, lo + (1 << 24) - 1, f"C{(2 * b + 1) % 97}"))
    return spark.createDataFrame(
        rows, "net_lo long, net_hi long, country_iso_code string"
    )
