"""Streaming source builders.

The reference reads one Kafka topic (ProcessStockStream.py:93-98). The
engine's streaming jobs are source-agnostic: any streaming DataFrame with
the trade schema works. In this environment the Kafka connector jar is not
on the classpath, so tests and the catalog drive the jobs with the file
source (parquet directory replay) — the planner-facing semantics
(watermarks, windows, output modes, state) are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stock_streaming_data_pipeline_spark.tables import (
    _timestamp_read_confs,
    table_path,
)


def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


# events.parquet physical schema with ts as raw nanos (round-1 testdata
# generation; see tables.load_table).
EVENTS_NANOS_SCHEMA = _events_schema(T.LongType())

TRADES_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("volume", T.DoubleType()),
    ]
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming view of the events table (file source), normalized to the
    same schema as the batch loader (ts → TIMESTAMP in micros)."""
    _timestamp_read_confs(spark)
    # Streaming reads need an explicit schema; probe the batch reader for
    # the testdata generation's physical ts type (raw nano-long vs micros).
    import os

    p = table_path(sf_dir, "events")
    stored = spark.read.parquet(p).schema["ts"].dataType
    # The file stream source requires a directory. The driver's testdata
    # ships events.parquet as a single FILE inside the sf dir (scope the
    # listing with a glob); generated tiers (.scaletier) ship it as a
    # DIRECTORY of part files (stream that directory itself — a filename
    # glob on the parent would match no files and replay nothing).
    if os.path.isdir(p):
        read_dir, glob = p, None
    else:
        read_dir, glob = sf_dir, "events.parquet"

    def reader(schema: T.StructType):
        r = spark.readStream.schema(schema)
        if glob is not None:
            r = r.option("pathGlobFilter", glob)
        return r.parquet(read_dir)

    if isinstance(stored, T.LongType):
        raw = reader(EVENTS_NANOS_SCHEMA)
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return reader(_events_schema(T.TimestampType()))


def stream_trades(
    spark: SparkSession,
    trades_dir: str,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming view of a synthetic trades directory (sources/trades.py).

    ``max_files_per_trigger`` paces the replay into real micro-batches
    (availableNow honors it as maxFilesPerTrigger) — without it the file
    source drains everything in one batch, which hides per-batch latency
    tails and makes mid-stream fault injection impossible."""
    r = spark.readStream.schema(TRADES_SCHEMA)
    if max_files_per_trigger is not None:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.parquet(trades_dir)


def events_as_trades(events: DataFrame) -> DataFrame:
    """Map the events stream onto the trade contract (FIXTURES.md §5):
    event_type→symbol, value→price, props.k→volume."""
    return events.select(
        F.col("event_type").alias("symbol"),
        F.col("ts"),
        F.col("value").alias("price"),
        F.get_json_object("props", "$.k").cast("double").alias("volume"),
    )


DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming view of the documents table (file source) — the
    ingest-time shape of a curation pipeline: documents arrive as files
    land, and scoring/filter stages run per micro-batch."""
    import os

    p = table_path(sf_dir, "documents")
    if os.path.isdir(p):
        # generated tiers ship the table as a directory of part files
        return spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(p)
    return (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
