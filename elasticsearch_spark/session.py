"""SparkSession factory tuned for the fulltext engine.

Scale notes (100 TB / 1000-executor design):
- AQE on: runtime coalescing of shuffle partitions + skew-join splitting.
- Arrow enabled: every Python boundary is Arrow-batched (no per-row Python).
- shuffle.partitions is a local-mode default; on a real cluster it is set
  per-job from input size (``segments_for`` in sources.index_store picks the
  ingest parallelism explicitly).
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import SparkSession


def _package_zip() -> str:
    """Zip this package so executors can import it — the local-mode analog
    of ``spark-submit --py-files elasticsearch_spark.zip`` (the north-rule
    deployment shape). Rebuilt when sources are newer than the zip."""
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    out = os.path.join("/tmp", "elasticsearch_spark_pkg.zip")
    src_mtime = max(
        os.path.getmtime(os.path.join(dp, f))
        for dp, _, fs in os.walk(pkg_dir)
        for f in fs
        if f.endswith(".py")
    )
    if not os.path.exists(out) or os.path.getmtime(out) < src_mtime:
        tmp = out + ".tmp"
        with zipfile.ZipFile(tmp, "w") as z:
            for dp, _, fs in os.walk(pkg_dir):
                for f in fs:
                    if f.endswith(".py"):
                        p = os.path.join(dp, f)
                        z.write(p, os.path.relpath(p, root))
        os.replace(tmp, out)
    return out


def get_spark(
    app_name: str = "elasticsearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER", "local[%s]" % os.environ.get("SPARK_GRAFT_CPUS", "*"))
    cores = os.cpu_count() or 8
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(max(cores, 8))))
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.locality.wait", "0")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    try:
        spark.sparkContext.addPyFile(_package_zip())
    except Exception:
        pass  # already added in this context, or running from a --py-files deploy
    return spark
