"""Dependency-free Avro BINARY codec — the connector-free S2/S4 path.

The reference's wire format is Avro binary: the producer serializes with
``avro.io.DatumWriter`` (reference ``common_function.py:22-27``) and the
stream job decodes with ``from_avro`` against ``schemas/trades.avsc``
(reference ``ProcessStockStream.py:100-102``, jar added at submit time in
``dags/streaming-data-pipeline.py:104``). That jar is absent in this
runtime, so the built-in ``from_avro``/``to_avro`` stay gated
(sources/avro_codec.py) — but the Avro BINARY ENCODING itself is a small
public specification (Avro 1.11 spec §"Binary encoding"): zigzag-varint
longs, length-prefixed UTF-8 strings, little-endian IEEE doubles,
block-encoded arrays, index-prefixed unions, field-ordered records. This
module implements that subset in pure Python (the functions/xxh64_ref.py
discipline: public spec, no dependency), schema-driven from the same
``TRADES_AVSC`` JSON, so the engine can decode bytes produced by the
reference's producer — and produce bytes its consumer would accept —
without any jar.

Spark integration is Arrow-batched ``mapInPandas`` (payloads never reach
the driver; one pass, map-only at any scale). Spec conformance is pinned
in tests/test_avro_binary.py by GOLDEN BYTES spelled directly from the
specification (struct.pack + hand zigzags, independent of this codec),
plus multi-block and negative-block-count array decodes the spec allows
writers to emit.
"""

from __future__ import annotations

import json
import struct
from collections.abc import Iterator
from typing import Any

# ---------------------------------------------------------------------------
# Primitive binary forms (Avro spec: zigzag varint, IEEE LE floats)
# ---------------------------------------------------------------------------


def zigzag_encode(n: int) -> bytes:
    """long/int: zigzag then base-128 varint, little-endian groups."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def zigzag_decode(buf: bytes, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


# ---------------------------------------------------------------------------
# Schema-driven writer / reader
# ---------------------------------------------------------------------------


def _is_null_schema(node: Any) -> bool:
    return node == "null" or (isinstance(node, dict) and node.get("type") == "null")


def _union_branch_for(node: list, value: Any) -> int:
    """Writer branch choice: None -> the null branch; otherwise the first
    non-null branch (the trades schema's unions are all X-or-null)."""
    if value is None:
        for i, branch in enumerate(node):
            if _is_null_schema(branch):
                return i
        raise ValueError("None value but union has no null branch")
    for i, branch in enumerate(node):
        if not _is_null_schema(branch):
            return i
    raise ValueError("non-null value but union is all-null")


def write_datum(node: Any, value: Any, out: bytearray) -> None:
    """Append ``value``'s Avro binary form under schema ``node``."""
    if isinstance(node, dict) and node.get("type") in (
        "record",
        "array",
        "map",
    ):
        kind = node["type"]
    elif isinstance(node, dict):
        kind = node["type"]
    elif isinstance(node, list):
        kind = "union"
    else:
        kind = node

    if kind == "null":
        return
    if kind == "boolean":
        out.append(1 if value else 0)
        return
    if kind in ("int", "long"):
        out += zigzag_encode(int(value))
        return
    if kind == "float":
        out += struct.pack("<f", float(value))
        return
    if kind == "double":
        out += struct.pack("<d", float(value))
        return
    if kind == "bytes":
        out += zigzag_encode(len(value))
        out += bytes(value)
        return
    if kind == "string":
        raw = str(value).encode("utf-8")
        out += zigzag_encode(len(raw))
        out += raw
        return
    if kind == "union":
        idx = _union_branch_for(node, value)
        out += zigzag_encode(idx)
        write_datum(node[idx], value, out)
        return
    if kind == "array":
        items = list(value)
        if items:
            out += zigzag_encode(len(items))
            for item in items:
                write_datum(node["items"], item, out)
        out += zigzag_encode(0)
        return
    if kind == "map":
        entries = dict(value)
        if entries:
            out += zigzag_encode(len(entries))
            for k, v in entries.items():
                write_datum("string", k, out)
                write_datum(node["values"], v, out)
        out += zigzag_encode(0)
        return
    if kind == "record":
        for field in node["fields"]:
            write_datum(field["type"], value[field["name"]], out)
        return
    raise ValueError(f"unsupported avro schema node: {node!r}")


def read_datum(node: Any, buf: bytes, pos: int) -> tuple[Any, int]:
    """Decode one datum under schema ``node`` starting at ``pos``."""
    if isinstance(node, list):
        kind = "union"
    elif isinstance(node, dict):
        kind = node["type"]
    else:
        kind = node

    if kind == "null":
        return None, pos
    if kind == "boolean":
        return buf[pos] != 0, pos + 1
    if kind in ("int", "long"):
        return zigzag_decode(buf, pos)
    if kind == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if kind == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if kind == "bytes":
        n, pos = zigzag_decode(buf, pos)
        return bytes(buf[pos : pos + n]), pos + n
    if kind == "string":
        n, pos = zigzag_decode(buf, pos)
        return buf[pos : pos + n].decode("utf-8"), pos + n
    if kind == "union":
        idx, pos = zigzag_decode(buf, pos)
        return read_datum(node[idx], buf, pos)
    if kind == "array":
        out: list[Any] = []
        while True:
            count, pos = zigzag_decode(buf, pos)
            if count == 0:
                return out, pos
            if count < 0:
                # spec: negative count = block with a byte-size prefix
                # (lets readers skip blocks); the size itself is a long.
                count = -count
                _, pos = zigzag_decode(buf, pos)
            for _ in range(count):
                item, pos = read_datum(node["items"], buf, pos)
                out.append(item)
    if kind == "map":
        entries: dict[str, Any] = {}
        while True:
            count, pos = zigzag_decode(buf, pos)
            if count == 0:
                return entries, pos
            if count < 0:
                count = -count
                _, pos = zigzag_decode(buf, pos)
            for _ in range(count):
                k, pos = read_datum("string", buf, pos)
                v, pos = read_datum(node["values"], buf, pos)
                entries[k] = v
    if kind == "record":
        rec: dict[str, Any] = {}
        for field in node["fields"]:
            rec[field["name"]], pos = read_datum(field["type"], buf, pos)
        return rec, pos
    raise ValueError(f"unsupported avro schema node: {node!r}")


# ---------------------------------------------------------------------------
# trades.avsc message codec + Spark mapInPandas wrappers
# ---------------------------------------------------------------------------

# Spark's from_avro maps union(X, null) to nullable X — the decoded
# message shape below matches what the gated decode_trades would return.
MESSAGE_SPARK_SCHEMA = (
    "data array<struct<c: array<string>, p: double, s: string, t: long,"
    " v: double, cv: double>>, type string"
)


def _trades_schema() -> dict:
    from stock_streaming_data_pipeline_spark.sources.avro_codec import TRADES_AVSC

    return json.loads(TRADES_AVSC)


def encode_message(message: dict) -> bytes:
    """One reference-shaped envelope dict -> Avro binary bytes (what the
    reference producer's DatumWriter emits for the same datum)."""
    out = bytearray()
    write_datum(_trades_schema(), message, out)
    return bytes(out)


def decode_message(value: bytes) -> dict:
    """Avro binary bytes -> envelope dict; raises if trailing bytes
    remain (a truncated/misframed payload must not pass silently)."""
    message, pos = read_datum(_trades_schema(), bytes(value), 0)
    if pos != len(value):
        raise ValueError(
            f"avro message decoded {pos} of {len(value)} bytes — "
            "trailing garbage or wrong schema"
        )
    return message


def decode_envelopes_py(df, value_col: str = "value"):
    """Connector-free S2: binary Kafka-shaped values -> the decoded
    message struct, Arrow-batched (payloads stay on executors)."""
    schema = _trades_schema()

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for raw in pdf[value_col]:
                msg, pos = read_datum(schema, bytes(raw), 0)
                if pos != len(raw):
                    raise ValueError("avro message has trailing bytes")
                rows.append(msg)
            yield pd.DataFrame(
                {
                    "data": [m["data"] for m in rows],
                    "type": [m["type"] for m in rows],
                }
            )

    return df.mapInPandas(batches, MESSAGE_SPARK_SCHEMA)


def encode_envelopes_py(df, data_col: str = "data", type_col: str = "type"):
    """Connector-free S4: engine envelopes (sources/trades.py:to_envelopes
    — data items are struct(ts, symbol, price, volume)) -> Avro binary
    values under trades.avsc's wire field names: s=symbol, p=price,
    v=volume, t=epoch-MICROS long (the avsc only says ``long``; the
    reference's live feed used epoch millis — see trades_from_message's
    unit parameter), c=null conditions, cv=0.0."""
    schema = _trades_schema()

    def _epoch_us(ts: Any) -> int:
        # pandas.Timestamp.value is epoch NANOS
        return int(ts.value // 1_000)

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            vals = []
            for data, typ in zip(pdf[data_col], pdf[type_col]):
                trades = [
                    {
                        "c": None,
                        "p": float(t["price"]),
                        "s": str(t["symbol"]),
                        "t": _epoch_us(t["ts"]),
                        "v": float(t["volume"]),
                        "cv": 0.0,
                    }
                    for t in (
                        d if isinstance(d, dict) else d.asDict()
                        for d in data
                    )
                ]
                out = bytearray()
                write_datum(schema, {"data": trades, "type": str(typ)}, out)
                vals.append(bytes(out))
            yield pd.DataFrame({"value": vals})

    return df.mapInPandas(batches, "value binary")


def trades_from_message(decoded, *, unit: str = "us"):
    """The reference's post-from_avro projection
    (ProcessStockStream.py:104-110): explode ``data`` and surface the
    engine trade columns. ``unit`` interprets the avro ``t`` long —
    "us" for payloads produced by encode_envelopes_py, "ms" for the
    reference producer's live-feed epoch millis."""
    from pyspark.sql import functions as F

    if unit == "us":
        ts = F.timestamp_micros(F.col("t.t"))
    elif unit == "ms":
        ts = F.timestamp_millis(F.col("t.t"))
    else:
        raise ValueError(f"unit must be 'us' or 'ms', got {unit!r}")
    return (
        decoded.filter(F.col("type") == "trade")
        .select(F.explode("data").alias("t"))
        .select(
            F.col("t.s").alias("symbol"),
            ts.alias("ts"),
            F.col("t.p").alias("price"),
            F.col("t.v").alias("volume"),
        )
    )
