"""Kafka source/sink builders (SURVEY S1/S5/K3).

The reference subscribes to topic ``stock`` with earliest offsets
(ProcessStockStream.py:93-98) and publishes features to ``btc_features``
(:163-179). These builders produce the identical plans; they are gated
because the ``spark-sql-kafka`` connector jar is not on this environment's
classpath (the reference pins it at spark-submit time,
dags/streaming-data-pipeline.py:103-107). Everything downstream of the
source is connector-agnostic — tests drive the same topology through the
file source (sources/streams.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_available(spark: SparkSession) -> bool:
    """True when the Kafka connector is on the session's classpath."""
    try:
        spark._jvm.org.apache.spark.sql.kafka010.KafkaSourceProvider  # noqa: SLF001
        return True
    except Exception:
        return False


def read_stream(
    spark: SparkSession,
    *,
    brokers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """``readStream.format("kafka")`` with the reference's options."""
    if not kafka_available(spark):
        raise ModuleNotFoundError(
            "spark-sql-kafka connector jar is not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version> via "
            "spark.jars.packages (cf. reference dags/streaming-data-pipeline.py:103)"
        )
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def json_value_stream(raw: DataFrame, schema: T.StructType) -> DataFrame:
    """Decode a Kafka JSON ``value`` stream (the predictor's consumer,
    BtcPrediction/kafka.py:23-50, as from_json instead of json.loads)."""
    return raw.select(
        F.from_json(F.col("value").cast("string"), schema).alias("v")
    ).select("v.*")


def write_stream(df: DataFrame, *, brokers: str, topic: str, checkpoint: str):
    """``writeStream.format("kafka")`` for a (key, value)-shaped DataFrame
    (streaming/sinks.py:kafka_shaped)."""
    if not kafka_available(df.sparkSession):
        raise ModuleNotFoundError("spark-sql-kafka connector jar is not on the classpath")
    return (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
