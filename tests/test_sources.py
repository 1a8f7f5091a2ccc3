"""Source/codec gating + contract tests."""

from __future__ import annotations

import json

import pytest

from stock_streaming_data_pipeline_spark.sources import avro_codec, kafka


def test_kafka_gating(spark):
    if kafka.kafka_available(spark):
        pytest.skip("kafka connector present; gating not exercised")
    with pytest.raises(ModuleNotFoundError):
        kafka.read_stream(spark, brokers="localhost:9092", topic="stock")


def test_avro_schema_contract():
    schema = json.loads(avro_codec.TRADES_AVSC)
    assert schema["type"] == "record"
    fields = {f["name"] for f in schema["fields"]}
    assert fields == {"data", "type"}
    trade_fields = {
        f["name"]
        for f in schema["fields"][0]["type"]["items"]["fields"]
    }
    assert trade_fields == {"c", "p", "s", "t", "v", "cv"}


def test_avro_roundtrip_if_available(spark):
    if not avro_codec.avro_available(spark):
        pytest.skip("spark-avro jar not on classpath (expected here)")
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.struct(F.lit("x").alias("s"), F.lit(1.0).alias("p")).alias("t")
    )
    enc = df.select(avro_codec.encode_trades(F.col("t")).alias("b"))
    assert enc.collect()[0]["b"] is not None
