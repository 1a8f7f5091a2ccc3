"""SparkSession factory with scale-aware defaults.

The reference pins ``spark.sql.shuffle.partitions=2`` for its toy cluster
(reference: scripts/StreamProcessing/ProcessStockStream.py:48). We instead
rely on AQE (adaptive re-plan, partition coalescing, skew-join splitting) so
the same code runs on local[32] test boxes and on a 1000-executor cluster:
AQE coalesces the initial shuffle partitioning down at small scale and the
initial number is sized up for large scale via SPARK_GRAFT_CPUS / explicit
config rather than hardcoded.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Configs that matter at 100 TB and are safe at test scale. Notes:
# - AQE subsumes hand-tuned shuffle partition counts and handles skewed
#   join keys (salting is still applied in operators that self-join on
#   content-derived keys, e.g. dedup shingles).
# - Arrow makes every pandas interchange (createDataFrame, applyInPandas,
#   pandas_udf) batched instead of row-at-a-time pickling.
# - UTC session timezone pins timestamp semantics to the storage value so
#   results are reproducible regardless of host TZ (and match DuckDB).
_BASE_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # Split sizing: the local bench tiers are SMALL compressed files with
    # text/vector-dense per-row compute — a 128 MiB split (the cluster
    # default) would put an entire tier's scan+map stage on ONE of the 32
    # cores. 8 MiB splits keep scan stages parallel on multi-file /
    # multi-row-group inputs (the default 4 MiB per-file open cost stops
    # tiny files from packing back into one split) while adding at most
    # one empty byte range on the single-file single-row-group driver
    # testdata — measured ≤1% on the sf0.1 bench vs 128 MiB. At petabyte
    # scale with many large files, raise this toward the 128 MiB default
    # via SPARK_GRAFT_MAX_PARTITION_BYTES — the rule is
    # compressed-bytes-per-core-second of downstream compute, not a
    # universal constant.
    "spark.sql.files.maxPartitionBytes": os.environ.get(
        "SPARK_GRAFT_MAX_PARTITION_BYTES", "8388608"
    ),
    "spark.streaming.stopGracefullyOnShutdown": "true",
    "spark.ui.enabled": "false",
    # The engine runs hundreds of distinct queries per session (catalog
    # sweeps, the 17-query bench, the driver's 50-query sample); the
    # default 100-entry generated-class cache thrashes between passes, so
    # every pass of a wide-codegen query (the 65-column LR dense build,
    # the 64-min minhash aggregate) pays Janino+JIT again — measured
    # ~0.5-1.2 s per recompiled unit. 2000 entries keeps a full sweep's
    # classes resident for a few hundred MB of metaspace at worst. Static
    # conf: applies when the JVM session is built (configure_session
    # cannot flip it on a live driver session; its try/except skips it).
    "spark.sql.codegen.cache.maxEntries": "2000",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))


def _shuffle_partitions() -> str:
    """Initial shuffle partition count, sized to the advertised core count
    (SPARK_GRAFT_CPUS). AQE coalescing owns the effective number at small
    scale; at cluster scale raise SPARK_GRAFT_CPUS (or pass an explicit
    ``shuffle_partitions``) so the initial number matches the executor
    fleet. Round-12 fix: the driver-handed path (``configure_session``)
    previously re-applied a hardcoded 32 from _BASE_CONF regardless of
    SPARK_GRAFT_CPUS, diverging from ``get_spark``'s sizing."""
    return str(default_parallelism())


def get_spark(
    app_name: str = "stock_streaming_data_pipeline_spark",
    *,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    When the driver hands us an existing session (``__spark_entry__.entry``),
    we do NOT rebuild it — ``configure_session`` applies the runtime-settable
    subset instead.
    """
    cpus = default_parallelism()
    builder = SparkSession.builder.master(f"local[{cpus}]").appName(app_name)
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    # Local mode: the driver JVM is the only process; give it most of RAM.
    conf.setdefault("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# Subset of the engine defaults that can be flipped on a live session.
_RUNTIME_CONF = (
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.session.timeZone",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.parquet.filterPushdown",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.shuffle.partitions",
)


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built session."""
    conf = dict(_BASE_CONF)
    conf["spark.sql.shuffle.partitions"] = _shuffle_partitions()
    for key in _RUNTIME_CONF:
        try:
            spark.conf.set(key, conf[key])
        except Exception:
            pass  # non-runtime-settable on this build; defaults are fine
    return spark
