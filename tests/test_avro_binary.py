"""Avro binary codec conformance (SURVEY S2/S4, connector-free path).

The spark-avro jar is absent, so from_avro/to_avro stay gated — these
tests pin the pure-Python codec (sources/avro_binary.py) against the
Avro SPECIFICATION itself: golden bytes are spelled here directly from
the spec's binary-encoding rules (struct.pack + hand zigzags), NOT via
the codec under test, so an encoding bug cannot certify itself. Array
decoding also covers the spec's multi-block and negative-block-count
(size-prefixed) writer forms that round-trip tests alone never produce.
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.sources import avro_binary as ab
from stock_streaming_data_pipeline_spark.sources.avro_binary import (
    trades_from_message,
)
from stock_streaming_data_pipeline_spark.sources.trades import (
    synthetic_trades,
    to_envelopes,
)


def _zz(n: int) -> bytes:
    """Spec zigzag varint, written independently of the codec."""
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


def _golden_message_bytes() -> tuple[dict, bytes]:
    """One envelope with both union branches of `c` exercised, and its
    byte-for-byte Avro binary form per the spec:
    record message = fields in order (data, type);
    array = count block(s) then zero terminator;
    union = zigzag branch index then branch datum;
    string = zigzag length + utf8; double = 8-byte IEEE LE."""
    msg = {
        "data": [
            {"c": None, "p": 101.25, "s": "BTCUSDT", "t": 1700000000123,
             "v": 0.5, "cv": 50.625},
            {"c": ["1", None, "2"], "p": -7.5, "s": "é", "t": -3,
             "v": 2.0, "cv": -15.0},
        ],
        "type": "trade",
    }
    b = bytearray()
    b += _zz(2)  # data: one block of 2 items
    # -- trade 1: c is the null branch (unions in trades.avsc order
    #    [array, null] -> null is index 1)
    b += _zz(1)
    b += struct.pack("<d", 101.25)
    b += _zz(7) + "BTCUSDT".encode()
    b += _zz(1700000000123)
    b += struct.pack("<d", 0.5)
    b += struct.pack("<d", 50.625)
    # -- trade 2: c is the array branch (index 0); items are
    #    union [null, string] -> null index 0, string index 1
    b += _zz(0)
    b += _zz(3)  # item block of 3
    b += _zz(1) + _zz(1) + b"1"
    b += _zz(0)  # null item
    b += _zz(1) + _zz(1) + b"2"
    b += _zz(0)  # array terminator
    b += struct.pack("<d", -7.5)
    raw = "é".encode()
    b += _zz(len(raw)) + raw
    b += _zz(-3)
    b += struct.pack("<d", 2.0)
    b += struct.pack("<d", -15.0)
    # -- data array terminator, then the type field
    b += _zz(0)
    b += _zz(5) + b"trade"
    return msg, bytes(b)


def test_zigzag_spec_values():
    # spec's worked examples: 0->00, -1->01, 1->02, -2->03, 2->04
    for n, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"),
                    (-2, b"\x03"), (2, b"\x04"), (64, b"\x80\x01"),
                    (-65, b"\x81\x01")]:
        assert ab.zigzag_encode(n) == want
        got, pos = ab.zigzag_decode(want, 0)
        assert (got, pos) == (n, len(want))


def test_encode_matches_golden_spec_bytes():
    msg, want = _golden_message_bytes()
    assert ab.encode_message(msg) == want


def test_decode_matches_golden_spec_bytes():
    msg, raw = _golden_message_bytes()
    got = ab.decode_message(raw)
    assert got == msg


def test_decode_multiblock_and_sized_blocks():
    """Writers may split an array into several blocks and may prefix a
    block with its byte size (negative count) — a round-trip with our own
    encoder never produces these, so craft them by hand."""
    msg, _ = _golden_message_bytes()
    t1 = _golden_message_bytes()[1]
    # re-encode data as TWO single-item blocks, second with a size prefix
    one = bytearray()
    ab.write_datum(
        {"type": "record", "name": "t", "fields": [
            {"name": "c", "type": [{"type": "array", "items": ["null", "string"]}, "null"]},
            {"name": "p", "type": "double"}, {"name": "s", "type": "string"},
            {"name": "t", "type": "long"}, {"name": "v", "type": "double"},
            {"name": "cv", "type": "double"}]},
        msg["data"][0], one)
    two = bytearray()
    ab.write_datum(
        {"type": "record", "name": "t", "fields": [
            {"name": "c", "type": [{"type": "array", "items": ["null", "string"]}, "null"]},
            {"name": "p", "type": "double"}, {"name": "s", "type": "string"},
            {"name": "t", "type": "long"}, {"name": "v", "type": "double"},
            {"name": "cv", "type": "double"}]},
        msg["data"][1], two)
    b = bytearray()
    b += _zz(1) + one                      # block 1: plain count
    b += _zz(-1) + _zz(len(two)) + two     # block 2: negative count + size
    b += _zz(0)
    b += _zz(5) + b"trade"
    got = ab.decode_message(bytes(b))
    assert got == msg
    assert bytes(b) != t1  # genuinely a different writer framing


def test_trailing_bytes_rejected():
    _, raw = _golden_message_bytes()
    try:
        ab.decode_message(raw + b"\x00")
    except ValueError as e:
        assert "trailing" in str(e)
    else:
        raise AssertionError("trailing garbage must not decode silently")


def test_spark_envelope_roundtrip_through_avro_binary(spark):
    """End-to-end S4 -> S2 on executors: synthetic trades -> envelopes ->
    pure-Python Avro binary (mapInPandas) -> decode (mapInPandas) ->
    reference projection == the original trades. The decoded struct
    schema matches what the gated from_avro path would produce."""
    trades = synthetic_trades(spark, n_rows=2000)
    env = to_envelopes(trades, batch_seconds=5)
    encoded = ab.encode_envelopes_py(env)
    assert encoded.schema.simpleString() == "struct<value:binary>"
    decoded = ab.decode_envelopes_py(encoded)
    assert decoded.schema.simpleString() == (
        "struct<data:array<struct<c:array<string>,p:double,s:string,"
        "t:bigint,v:double,cv:double>>,type:string>"
    )
    back = trades_from_message(decoded, unit="us")
    a = trades.orderBy("symbol", "ts", "price").collect()
    b = back.orderBy("symbol", "ts", "price").collect()
    assert a == b


def test_spark_decode_reads_reference_producer_bytes(spark):
    """Bytes framed exactly as the reference producer's DatumWriter emits
    (the golden spec form) decode on executors into the from_avro struct
    shape."""
    msg, raw = _golden_message_bytes()
    df = spark.createDataFrame([(raw,), (raw,)], "value binary")
    out = ab.decode_envelopes_py(df)
    rows = out.collect()
    assert len(rows) == 2
    assert rows[0]["type"] == "trade"
    d = rows[0]["data"]
    assert len(d) == 2
    assert d[0]["s"] == "BTCUSDT" and d[0]["c"] is None
    assert d[1]["c"] == ["1", None, "2"] and d[1]["t"] == -3
    assert float(d[0]["p"]) == 101.25


def test_spark_encode_matches_python_encoder(spark):
    """The executor-side encoder emits byte-identical payloads to the
    row-level reference encoder (same spec walk, Arrow batch transport),
    under the documented envelope->wire field mapping."""
    import datetime as dt

    def epoch_us(naive: dt.datetime) -> int:
        # exact integer micros from timedelta components (UTC session)
        d = naive - dt.datetime(1970, 1, 1)
        return d.days * 86_400_000_000 + d.seconds * 1_000_000 + d.microseconds

    trades = synthetic_trades(spark, n_rows=500)
    env = to_envelopes(trades, batch_seconds=5)
    rows = env.collect()
    got = {
        bytes(r["value"])
        for r in ab.encode_envelopes_py(env).collect()
    }
    want = {
        ab.encode_message(
            {
                "data": [
                    {
                        "c": None,
                        "p": float(t["price"]),
                        "s": t["symbol"],
                        "t": epoch_us(t["ts"]),
                        "v": float(t["volume"]),
                        "cv": 0.0,
                    }
                    for t in (x.asDict() for x in r["data"])
                ],
                "type": r["type"],
            }
        )
        for r in rows
    }
    assert got == want


def test_envelope_bytes_parse_with_spark_from_avro_if_available(spark):
    """If the spark-avro jar ever appears in this runtime, the pure-Python
    bytes must parse with the REAL from_avro against trades.avsc — the
    strongest cross-implementation check; skipped while the jar is absent
    (gate re-checked every round in COVERAGE.md)."""
    import pytest

    from stock_streaming_data_pipeline_spark.sources import avro_codec

    if not avro_codec.avro_available(spark):
        pytest.skip("spark-avro jar absent (environment gate)")
    _, raw = _golden_message_bytes()
    df = spark.createDataFrame([(raw,)], "value binary")
    out = df.select(
        avro_codec.decode_trades(F.col("value")).alias("m")
    ).collect()
    assert out[0]["m"]["type"] == "trade"


def test_streaming_avro_topology_end_to_end(spark, tmp_path):
    """The reference's full stream shape (ProcessStockStream.py:91-129:
    Kafka value bytes -> from_avro -> explode -> watermark -> tumbling
    agg) run as a REAL streaming query with the connector-free codec:
    Avro-binary payload files replay through the file source, decode via
    Arrow-batched mapInPandas INSIDE the stream, and the settled windowed
    volumes equal the batch aggregation of the original trades."""
    from stock_streaming_data_pipeline_spark.plans import catalog as cat

    cat._load_all()
    from stock_streaming_data_pipeline_spark.plans.streaming_queries import settle

    trades = synthetic_trades(spark, n_rows=4000)
    payloads = ab.encode_envelopes_py(to_envelopes(trades, batch_seconds=5))
    src = str(tmp_path / "kafka_values")
    payloads.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("value binary").parquet(src)
    )
    decoded = trades_from_message(ab.decode_envelopes_py(stream), unit="us")
    agg = (
        decoded.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 minute").alias("w"), F.col("symbol"))
        .agg(F.round(F.sum("volume"), 6).alias("total_volume"))
    )
    settled = settle(agg, "complete").select(
        "symbol", F.col("w.start").alias("ws"), "total_volume"
    )

    batch = (
        trades.groupBy(F.window("ts", "1 minute").alias("w"), F.col("symbol"))
        .agg(F.round(F.sum("volume"), 6).alias("total_volume"))
        .select("symbol", F.col("w.start").alias("ws"), "total_volume")
    )
    got = sorted(map(tuple, settled.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert len(want) > 0
    assert got == want


def test_avro_roundtrip_fuzz():
    """Hypothesis round-trip over the full value domain the schema
    admits: unicode symbols, full-range int64 timestamps, signed/denormal
    /infinite doubles (NaN compared bitwise — NaN != NaN would fail a
    naive equality even on a correct codec), conditions absent, empty, or
    holding nulls. A hand-written binary codec earns trust from exactly
    this kind of adversarial domain sweep on top of the golden bytes."""
    import math
    import struct as _s

    from hypothesis import given, settings
    from hypothesis import strategies as st

    doubles = st.one_of(
        st.floats(allow_nan=False, allow_infinity=True, width=64),
        st.just(float("nan")),
        st.just(-0.0),
        st.just(5e-324),  # smallest denormal
    )
    conditions = st.one_of(
        st.none(),
        st.lists(st.one_of(st.none(), st.text(max_size=8)), max_size=4),
    )
    trade = st.fixed_dictionaries(
        {
            "c": conditions,
            "p": doubles,
            "s": st.text(max_size=12),
            "t": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "v": doubles,
            "cv": doubles,
        }
    )
    message = st.fixed_dictionaries(
        {"data": st.lists(trade, max_size=6), "type": st.text(max_size=10)}
    )

    def eq(a, b):  # NaN-tolerant deep equality (bitwise on doubles)
        if isinstance(a, float) and isinstance(b, float):
            return _s.pack("<d", a) == _s.pack("<d", b)
        if isinstance(a, list) and isinstance(b, list):
            return len(a) == len(b) and all(eq(x, y) for x, y in zip(a, b))
        if isinstance(a, dict) and isinstance(b, dict):
            return a.keys() == b.keys() and all(eq(a[k], b[k]) for k in a)
        return a == b

    @given(message)
    @settings(max_examples=200, deadline=None)
    def run(msg):
        back = ab.decode_message(ab.encode_message(msg))
        assert eq(back, msg), (msg, back)

    run()
    assert math.isnan(
        ab.decode_message(
            ab.encode_message({"data": [{"c": None, "p": float("nan"),
                                         "s": "", "t": 0, "v": 0.0,
                                         "cv": 0.0}], "type": ""})
        )["data"][0]["p"]
    )
