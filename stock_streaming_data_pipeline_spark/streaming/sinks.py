"""Streaming sinks.

The reference fans out to Cassandra (keyed upsert via PK, ddl.cql:7,15),
Kafka (JSON key/value, ProcessStockStream.py:163-179) and a Hive-partitioned
file store (:181-191). Here:

- **Keyed upsert** → an LSM-style parquet sink: each micro-batch appends
  files stamped with the batch epoch; readers resolve last-write-wins per
  key with ``max_by(values, epoch)``. This is exactly Cassandra's
  upsert-resolved-at-read model, is idempotent under update-mode replays
  (same epoch overwrites), and at 100 TB maps onto Delta/Iceberg MERGE or
  a periodic compaction job — the writer path (blind appends, no
  read-modify-write) is the part that must scale, and it does.
  Unlike the reference we do NOT swallow per-batch write errors
  (ProcessStockStream.py:74-75 silently breaks exactly-once; SURVEY §4).

- **Kafka-shaped sink** → the same ``(key, value)`` JSON projection the
  reference publishes, written to parquet when no broker is on the
  classpath; swap ``.format("kafka")`` in with zero plan changes.

- **Partitioned feature store** → parquet partitioned by
  year/month/day (+hour), the reference's CSV layout generalized columnar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def upsert_writer(path: str, key_cols: list[str]):
    """foreachBatch writer: append batch stamped with its epoch id.

    Deterministic per epoch → replays after a failure rewrite the same
    logical rows, and the read-side last-write-wins keeps one winner.
    """

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("_epoch", F.lit(int(epoch_id)))
            .write.mode("append")
            .parquet(path)
        )

    return write


def read_upsert_table(spark: SparkSession, path: str, key_cols: list[str]) -> DataFrame:
    """Resolve the keyed-upsert sink to its current state: latest row per
    key by (epoch, row order), i.e. Cassandra-style last-write-wins."""
    df = spark.read.parquet(path)
    value_cols = [c for c in df.columns if c not in key_cols and c != "_epoch"]
    aggs = [
        F.expr(f"max_by({c}, _epoch)").alias(c) for c in value_cols
    ]
    return df.groupBy(*key_cols).agg(*aggs)


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for any Hadoop-supported URI (file://, s3a://…)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def compact_upsert_table(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    *,
    _crash_after_publish: bool = False,
) -> None:
    """Compaction for the LSM-style upsert sink: rewrite the resolved
    last-write-wins state as one new winning epoch, then drop the history
    files. This is the maintenance job that bounds read amplification at
    scale (the Delta/Iceberg analogue is OPTIMIZE / rewrite-data-files).

    Crash-safe by construction — there is no delete-then-move window:
    1. list the current data files;
    2. APPEND the resolved state stamped with epoch = -1;
    3. delete the files listed in (1).
    A crash after (2) leaves duplicate history, but readers resolve the
    identical state at every point: each compacted row carries the value
    of its key's max-epoch winner, so last-write-wins returns the same
    values whether the original files are still present or not. Epoch -1
    (below any real micro-batch id) keeps post-compaction queries winning
    even when a fresh checkpoint restarts epochs at 0. Uses Hadoop
    FileSystem APIs, so the same code runs on file://, s3a://, hdfs://.
    """
    fs, hpath = _hadoop_fs(spark, path)
    old_files = [
        f.getPath()
        for f in fs.listStatus(hpath)
        if f.isFile() and not f.getPath().getName().startswith("_")
    ]
    # Pin the read to the exact pre-compaction file list: the plan's input
    # set cannot drift while we append the compacted epoch alongside it.
    df = spark.read.parquet(*[f.toString() for f in old_files])
    value_cols = [c for c in df.columns if c not in key_cols and c != "_epoch"]
    resolved = (
        df.groupBy(*key_cols)
        .agg(*[F.expr(f"max_by({c}, _epoch)").alias(c) for c in value_cols])
        .withColumn("_epoch", F.lit(-1))
    )
    resolved.write.mode("append").parquet(path)
    if _crash_after_publish:
        # failpoint for the crash-injection test: die between publishing
        # the compacted epoch and tombstoning the history files
        return
    for f in old_files:
        fs.delete(f, False)


def read_upsert_table_as_of(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    *,
    as_of_epoch: int,
) -> DataFrame:
    """Time travel on the LSM upsert sink: the last-write-wins state AS
    OF a past epoch — resolve only over rows stamped ≤ the cut (the
    Delta ``VERSION AS OF`` read, for free from the epoch stamps; same
    retention contract as read_changes: compaction collapses history, so
    snapshots only resolve against epochs still present)."""
    df = spark.read.parquet(path).filter(F.col("_epoch") <= F.lit(as_of_epoch))
    value_cols = [c for c in df.columns if c not in key_cols and c != "_epoch"]
    return df.groupBy(*key_cols).agg(
        *[F.expr(f"max_by({c}, _epoch)").alias(c) for c in value_cols]
    )


def read_changes(
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    *,
    since_epoch: int,
) -> DataFrame:
    """Change-data feed over the LSM upsert sink: the keys whose
    last-write-wins state changed AFTER ``since_epoch``, with the winning
    value, the commit epoch, and whether the key existed at the cut
    (``update``) or is new (``insert``) — the Delta/Iceberg
    changed-rows-since-version read, resolved from the same epoch stamps
    the writer already lays down. One partial-aggregated groupBy on the
    key; no extra state is ever written.

    Retention contract (same as Delta CDF after VACUUM): compaction
    collapses history into epoch −1, so a CDC cut only resolves against
    epochs still present in the table — take changes feeds BEFORE
    compacting past the cut.
    """
    df = spark.read.parquet(path)
    value_cols = [c for c in df.columns if c not in key_cols and c != "_epoch"]
    resolved = df.groupBy(*key_cols).agg(
        *[F.expr(f"max_by({c}, _epoch)").alias(c) for c in value_cols],
        F.max("_epoch").alias("_commit_epoch"),
        F.max(
            F.when(F.col("_epoch") <= F.lit(since_epoch), 1).otherwise(0)
        ).alias("_existed"),
    )
    return (
        resolved.filter(F.col("_commit_epoch") > F.lit(since_epoch))
        .withColumn(
            "_change_type",
            F.when(F.col("_existed") == 1, F.lit("update")).otherwise(
                F.lit("insert")
            ),
        )
        .drop("_existed")
    )


def kafka_shaped(df: DataFrame, *, key: str, value_struct: list[str]) -> DataFrame:
    """Project to the Kafka message contract the reference publishes:
    ``key = symbol``, ``value = to_json(named_struct(...))``
    (ProcessStockStream.py:163-172)."""
    return df.select(
        F.col(key).cast("string").alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in value_struct])).alias("value"),
    )


def with_date_partitions(df: DataFrame, ts: str = "timestamp") -> DataFrame:
    """Derive the Hive partition columns (ProcessStockStream.py:181-184)."""
    return (
        df.withColumn("year", F.year(ts))
        .withColumn("month", F.month(ts))
        .withColumn("day", F.dayofmonth(ts))
        .withColumn("hour", F.hour(ts))
    )


def tombstone_writer(path: str, key_cols: list[str]):
    """foreachBatch DELETE writer for the LSM upsert sink: append
    keys-only rows flagged ``_deleted`` at the batch epoch. Blind append
    like the upsert writer (no read-modify-write) — deletion is resolved
    at read, exactly Cassandra's tombstone model."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.select(*key_cols)
            .withColumn("_epoch", F.lit(int(epoch_id)))
            .withColumn("_deleted", F.lit(True))
            .write.mode("append")
            .parquet(path)
        )

    return write


def _winner_struct_expr(value_cols: list[str], has_deleted: bool) -> str:
    fields = []
    for c in value_cols:
        fields.append(f"'{c}', {c}")
    fields.append(
        "'_deleted', coalesce(_deleted, false)"
        if has_deleted
        else "'_deleted', false"
    )
    return f"max_by(named_struct({', '.join(fields)}), _epoch)"


def read_upsert_table_with_deletes(
    spark: SparkSession, path: str, key_cols: list[str]
) -> DataFrame:
    """Last-write-wins WITH tombstones: the winning row per key is picked
    as one struct (never column-by-column — per-column max_by would
    stitch values across rows when tombstones hold NULL value columns),
    and keys whose winner is a tombstone disappear from the view."""
    df = spark.read.option("mergeSchema", "true").parquet(path)
    value_cols = [
        c for c in df.columns if c not in key_cols and c not in ("_epoch", "_deleted")
    ]
    has_del = "_deleted" in df.columns
    resolved = df.groupBy(*key_cols).agg(
        F.expr(_winner_struct_expr(value_cols, has_del)).alias("_w")
    )
    return resolved.filter(~F.col("_w._deleted")).select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in value_cols]
    )


def compact_upsert_table_with_deletes(
    spark: SparkSession, path: str, key_cols: list[str]
) -> None:
    """Delete-aware compaction: rewrite the resolved live state as epoch
    −1 and physically drop tombstoned keys (tombstones past compaction
    need no grave markers — the whole history collapses with them).
    Same crash-safe publish/tombstone ordering as compact_upsert_table."""
    fs, hpath = _hadoop_fs(spark, path)
    old_files = [
        f.getPath()
        for f in fs.listStatus(hpath)
        if f.isFile() and not f.getPath().getName().startswith("_")
    ]
    df = spark.read.option("mergeSchema", "true").parquet(
        *[f.toString() for f in old_files]
    )
    value_cols = [
        c for c in df.columns if c not in key_cols and c not in ("_epoch", "_deleted")
    ]
    has_del = "_deleted" in df.columns
    resolved = (
        df.groupBy(*key_cols)
        .agg(F.expr(_winner_struct_expr(value_cols, has_del)).alias("_w"))
        .filter(~F.col("_w._deleted"))
        .select(*key_cols, *[F.col(f"_w.{c}").alias(c) for c in value_cols])
        .withColumn("_epoch", F.lit(-1))
    )
    resolved.write.mode("append").parquet(path)
    for f in old_files:
        fs.delete(f, False)


def missing_date_partitions(
    spark: SparkSession,
    path: str,
    *,
    start: str,
    end: str,
    grain: str = "day",
) -> list[dict]:
    """Backfill planning for the date-partitioned feature store: which
    year/month/day(/hour) directories in [start, end] hold no data?
    Driver-side directory listing only (partition dirs are metadata);
    returns the partition-spec dicts a backfill job should recompute —
    the gap detector that turns 'rerun the whole month' into 'rerun the
    two missing days'."""
    import datetime as dt

    fs, hpath = _hadoop_fs(spark, path)
    t0 = dt.date.fromisoformat(start)
    t1 = dt.date.fromisoformat(end)
    if grain != "day":
        raise ValueError("only day grain implemented; hour follows the same walk")
    missing = []
    cur = t0
    while cur <= t1:
        part = (
            f"{path}/year={cur.year}/month={cur.month}/day={cur.day}"
        )
        ppath = spark._jvm.org.apache.hadoop.fs.Path(part)
        exists = fs.exists(ppath)
        has_data = exists and any(
            f.isFile() and f.getLen() > 0 and not f.getPath().getName().startswith("_")
            for f in fs.listStatus(ppath)
        )
        if not has_data:
            missing.append({"year": cur.year, "month": cur.month, "day": cur.day})
        cur += dt.timedelta(days=1)
    return missing
