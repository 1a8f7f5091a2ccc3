"""Canonical testdata table loaders.

The driver materializes a TPC-H-ish star schema plus ``events`` (the batch
stand-in for the reference's trade stream — key=event_type/user_id,
event-time=ts, measure=value; see FIXTURES.md §5), ``documents`` and
``embeddings`` (LLM-data operators). One parquet file per table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def duck_glob(sf_dir: str, name: str) -> str:
    """read_parquet pattern for a table: Spark reads a `<t>.parquet`
    directory of part files transparently, DuckDB needs the glob. The
    driver's testdata tables are single files; the locally generated
    .scaletier tiers are directories."""
    p = table_path(sf_dir, name)
    return os.path.join(p, "*.parquet") if os.path.isdir(p) else p


def _timestamp_read_confs(spark: SparkSession) -> None:
    """Pin timestamp semantics across testdata generations.

    The driver has shipped events.ts as parquet TIMESTAMP(NANOS) (round 1;
    Spark's vectorized reader only accepts it as a raw long) and as
    TIMESTAMP(MICROS, isAdjustedToUTC=false) (round 2+, which Spark would
    otherwise infer as TIMESTAMP_NTZ). Both confs together normalize every
    generation to the same contract: a TimestampType instant whose
    ``unix_micros`` equals the stored value — exactly DuckDB's ``epoch_us``
    on the same file — so epoch arithmetic in the catalog is engine- and
    session-timezone-independent.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _timestamp_read_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # TIMESTAMP(NANOS) generation: truncate to micros, the same
            # truncation DuckDB applies when it coerces NS to TIMESTAMP.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def fan_out(df: DataFrame, parts: int | None = None) -> DataFrame:
    """Round-robin repartition up to the session's default parallelism —
    ONLY when the upstream scan has fewer splits.

    Why: a single parquet file with one row group is one scan task; every
    CPU-heavy expression downstream (shingling, hashing, vector math) then
    runs single-threaded no matter how many cores the cluster has. A
    round-robin exchange of the (small) source rows unlocks full-width
    execution. At 100 TB the input has thousands of splits, so the guard
    makes this a no-op there — the exchange only ever pays for itself.

    The split count is estimated from the scan's file list + sizes
    (driver-side metadata only) rather than ``df.rdd.getNumPartitions()``
    — touching ``.rdd`` forces full physical planning of the upstream
    plan just to read a partition count. File-count short-circuit first,
    so at scale no per-file status calls happen either.
    """
    import math

    spark = df.sparkSession
    target = parts or spark.sparkContext.defaultParallelism
    files = df.inputFiles()
    if len(files) >= target:
        return df  # already at least one task per core
    if files:
        raw = str(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        ).strip().lower()
        mult = 1
        for suf, m in (
            ("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
            ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1),
        ):
            if raw.endswith(suf):
                raw, mult = raw[: -len(suf)], m
                break
        max_bytes = int(float(raw) * mult) if raw else 128 << 20
        jconf = spark._jsc.hadoopConfiguration()
        jvm = spark._jvm
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(jconf).getFileStatus(p).getLen()
        splits = max(len(files), math.ceil(total / max_bytes))
        if splits >= target:
            return df  # big files split into enough tasks on their own
    return df.repartition(target)


def load_events_pruned(
    spark: SparkSession,
    sf_dir: str,
    *,
    start: str | None = None,
    end: str | None = None,
) -> DataFrame:
    """events with a time-range predicate that actually reaches the scan.

    Filters applied after a driver-side type conversion cannot push down.
    This helper filters the column in its STORED type first — parquet
    row-group pruning and PushedFilters both engage — then normalizes.
    For the TIMESTAMP(NANOS) generation that means raw nano-long bounds;
    for TIMESTAMP(MICROS) data the bounds are timezone-pinned epoch-micros
    literals. ``start`` is inclusive, ``end`` exclusive (UTC timestamps,
    e.g. '2024-01-10').
    """
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    _timestamp_read_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, "events"))

    def micros(s: str) -> int:
        t = dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc)
        return int(t.timestamp() * 1_000_000)

    if isinstance(df.schema["ts"].dataType, T.LongType):
        if start is not None:
            df = df.filter(F.col("ts") >= F.lit(micros(start) * 1000))
        if end is not None:
            df = df.filter(F.col("ts") < F.lit(micros(end) * 1000))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # timestamp_micros(lit) builds the bound from an epoch integer, so the
    # predicate is the same instant regardless of session timezone.
    if start is not None:
        df = df.filter(F.col("ts") >= F.timestamp_micros(F.lit(micros(start))))
    if end is not None:
        df = df.filter(F.col("ts") < F.timestamp_micros(F.lit(micros(end))))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view (for the SQL surface)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
