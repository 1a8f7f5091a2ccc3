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


def test_json_malformed_record_modes(spark, tmp_path):
    """Bad-record handling contract for JSON ingestion (the reference's
    consumer assumes clean feeds; a real pipeline must pick a policy):
    PERMISSIVE captures the raw line in _corrupt_record, DROPMALFORMED
    silently drops, FAILFAST raises."""
    import pytest

    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"symbol": "BTC", "price": 1.5}\n'
        "THIS IS NOT JSON\n"
        '{"symbol": "ETH", "price": 2.5}\n'
        '{"symbol": "SOL", "price": "not_a_number"}\n'
    )
    schema = "symbol string, price double, _corrupt_record string"

    perm = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = perm.collect()
    assert len(rows) == 4
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(corrupt) == 2  # the non-JSON line and the bad-typed price
    good = {r["symbol"]: r["price"] for r in rows if r["_corrupt_record"] is None}
    assert good == {"BTC": 1.5, "ETH": 2.5}

    dropped = (
        spark.read.schema("symbol string, price double")
        .option("mode", "DROPMALFORMED")
        .json(str(p))
    )
    assert {r["symbol"] for r in dropped.collect() if r["symbol"]} >= {"BTC", "ETH"}

    with pytest.raises(Exception):
        (
            spark.read.schema("symbol string, price double")
            .option("mode", "FAILFAST")
            .json(str(p))
            .collect()
        )


def test_stream_events_directory_shaped_table(spark, tmp_path):
    """The streaming file source must replay a table shipped as a
    DIRECTORY of part files (the normal production layout and the
    generated .scaletier shape) — the filename-glob listing used for
    the driver's single-file layout matches nothing there and silently
    replays an empty stream (caught by the sf1 full-catalog sweep)."""
    import datetime as dt
    import os

    import pandas as pd

    from stock_streaming_data_pipeline_spark.sources.streams import (
        stream_events,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=i), 1 + i % 3, "view", 1.0, "{}")
        for i in range(10)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    d = str(tmp_path / "sf")
    part_dir = os.path.join(d, "events.parquet")
    os.makedirs(part_dir)
    pdf.iloc[:5].to_parquet(os.path.join(part_dir, "part-00.parquet"))
    pdf.iloc[5:].to_parquet(os.path.join(part_dir, "part-01.parquet"))

    out = str(tmp_path / "ckpt")
    stream = stream_events(spark, d)
    q = (
        stream.writeStream.format("memory")
        .queryName("dirshaped_events")
        .option("checkpointLocation", out)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n FROM dirshaped_events").first()["n"]
    assert got == 10
