"""Custom Spark Python DataSource for the trade feed (batch + streaming).

The reference ingests trades from a websocket producer into Kafka
(scripts/KafkaStream/*, out of engine scope per SURVEY §2.1); round 1
substituted a driver-side synthetic generator (sources/trades.py). This
module upgrades that substitute to a FIRST-CLASS Spark source using the
Spark 4 Python DataSource API: ``spark.read.format("trade_gen")`` and
``spark.readStream.format("trade_gen")`` both work, partitions generate
in parallel on executors, and the stream participates in real
checkpointed micro-batch execution (offsets = row ranges).

Generation is a pure function of the GLOBAL row index via the repo's
portable md5 hash — deterministic across partitionings, engines and
reruns — so even this custom source sits under a DuckDB differential
oracle (the oracle regenerates the feed with the same md5 arithmetic
over generate_series).

Scale shape: n_partitions range-splits the row space; each executor
generates its slice independently (no driver data, no coordination);
the stream's offset log stores two integers per batch.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SYMBOLS = ("BTCUSDT", "ETHUSDT", "SOLUSDT", "ADAUSDT")
START_EPOCH_S = 1_704_067_200  # 2024-01-01T00:00:00Z


def _h(salt: str, i: int) -> int:
    """Top 60 bits of md5(salt || i) — the same portable hash contract as
    operators/dedup.portable_hash, replayable as
    ('0x' || substr(md5(salt || i::VARCHAR), 1, 15))::BIGINT in DuckDB."""
    return int(hashlib.md5(f"{salt}{i}".encode()).hexdigest()[:15], 16)


def gen_row(i: int) -> tuple:
    """Trade #i: symbol round-robins; price/qty derive from the hash."""
    import datetime as dt

    sym = SYMBOLS[i % len(SYMBOLS)]
    price = (1000 + _h("p", i) % 100_000) / 100.0
    qty = float(_h("q", i) % 100)
    ts = dt.datetime.fromtimestamp(START_EPOCH_S + i, dt.timezone.utc).replace(
        tzinfo=None
    )
    return (int(i), sym, ts, price, qty)


SCHEMA = StructType(
    [
        StructField("trade_id", LongType()),
        StructField("symbol", StringType()),
        StructField("ts", TimestampType()),
        StructField("price", DoubleType()),
        StructField("qty", DoubleType()),
    ]
)


@dataclass
class _Range(InputPartition):
    start: int
    end: int


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("n_partitions", 4))

    def partitions(self):
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            _Range(s, min(s + step, self.n_rows))
            for s in range(0, self.n_rows, step)
        ]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield gen_row(i)


class _StreamReader(DataSourceStreamReader):
    """Offsets are plain row indices.

    ``rows_per_batch=0`` (default): the whole feed is "available" at
    once — availableNow drains it in one batch and a RESTART on the same
    checkpoint is a no-op (the engine sees latest == committed), i.e.
    exactly-once across restarts. ``rows_per_batch>0``: latestOffset
    advances per trigger — multi-micro-batch execution under a
    processing-time trigger WITHIN one run (the Python stream API gives
    latestOffset no view of the committed offset, so a per-trigger cap
    cannot resume across restarts; the offset log still guarantees no
    re-emission)."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.rows_per_batch = int(options.get("rows_per_batch", 0))
        self._latest = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        if self.rows_per_batch <= 0:
            return {"index": self.n_rows}
        self._latest = min(self._latest + self.rows_per_batch, self.n_rows)
        return {"index": self._latest}

    def partitions(self, start, end):
        return [_Range(start["index"], end["index"])]

    def read(self, partition: _Range):
        for i in range(partition.start, partition.end):
            yield gen_row(i)

    def commit(self, end):
        pass  # nothing to clean up — generation is stateless


class TradeGenDataSource(DataSource):
    """``trade_gen``: deterministic trade feed as a real Spark source."""

    @classmethod
    def name(cls):
        return "trade_gen"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TradeGenDataSource)


def sql_trade_gen(n_rows: int) -> str:
    """DuckDB CTE body named ``trade_gen`` replaying the generator."""
    syms = ", ".join(f"'{s}'" for s in SYMBOLS)
    return f"""trade_gen AS (
  SELECT i AS trade_id,
         [{syms}][CAST(i % {len(SYMBOLS)} AS INT) + 1] AS symbol,
         to_timestamp({START_EPOCH_S} + i)::TIMESTAMP AS ts,
         (1000 + ('0x' || substr(md5('p' || i::VARCHAR), 1, 15))::BIGINT
                 % 100000) / 100.0 AS price,
         (('0x' || substr(md5('q' || i::VARCHAR), 1, 15))::BIGINT
          % 100)::DOUBLE AS qty
  FROM generate_series(0, {n_rows - 1}) AS g(i)
)"""
