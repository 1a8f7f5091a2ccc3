"""Avro codec (SURVEY S2/S4): the reference's wire format.

The reference decodes Kafka values with ``from_avro`` against
``schemas/trades.avsc`` (ProcessStockStream.py:100-102) and the producer
encodes with avro ``DatumWriter`` (common_function.py:22-27). The
``spark-avro`` module is an external jar not present here, so the built-in
``from_avro``/``to_avro`` path is gated; the schema contract itself is
reproduced below and the envelope semantics (array-of-trades + type) are
covered connector-free by sources/trades.py:to_envelopes/explode_envelopes.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, SparkSession

# The reference's reader schema, field-for-field (trades.avsc:1-55).
TRADES_AVSC: str = json.dumps(
    {
        "type": "record",
        "name": "message",
        "fields": [
            {
                "name": "data",
                "type": {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "trade",
                        "fields": [
                            {"name": "c", "type": [{"type": "array", "items": ["null", "string"]}, "null"]},
                            {"name": "p", "type": "double"},
                            {"name": "s", "type": "string"},
                            {"name": "t", "type": "long"},
                            {"name": "v", "type": "double"},
                            {"name": "cv", "type": "double"},
                        ],
                    },
                },
            },
            {"name": "type", "type": "string"},
        ],
    }
)


def avro_available(spark: SparkSession) -> bool:
    try:
        # Class.forName actually resolves the class (a bare _jvm attribute
        # access returns a lazy JavaPackage and never fails).
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.spark.sql.avro.AvroDataToCatalyst"
        )
        return True
    except Exception:
        return False


def decode_trades(value: Column, schema: str = TRADES_AVSC) -> Column:
    """``from_avro(value, schema)`` — requires the spark-avro jar
    (reference adds org.apache.spark:spark-avro at submit time,
    dags/streaming-data-pipeline.py:104)."""
    try:
        from pyspark.sql.avro.functions import from_avro
    except ImportError as exc:  # pragma: no cover
        raise ModuleNotFoundError("pyspark avro wrapper missing") from exc
    return from_avro(value, schema)


def encode_trades(struct: Column) -> Column:
    """``to_avro(struct)`` — producer-side encode (S4)."""
    from pyspark.sql.avro.functions import to_avro

    return to_avro(struct)
