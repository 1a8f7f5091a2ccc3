"""The four-query streaming fan-out (the reference's whole topology).

Mirrors ProcessStockStream.py:91-196 Spark-first: one logical trade stream
feeds four concurrent StreamingQuery instances, each with its own output
mode, trigger and checkpoint:

  q1 volume_tracking  — 1-min tumbling agg, 30 s watermark, UPDATE mode,
                        keyed-upsert sink            (:112-129)
  q2 price_tracking   — raw tick projection, UPDATE mode, keyed-upsert
                        sink                         (:132-138)
  q3 features→kafka   — 30s/10s sliding agg, 10 s watermark, APPEND mode,
                        kafka-shaped (key, json value) sink (:143-179)
  q4 feature store    — same agg, APPEND mode, parquet partitioned by
                        year/month/day               (:181-191)

Divergences (deliberate, SURVEY §2.5/§4): ``close`` is pinned by event time
(max_by) instead of arrival-order last(); per-batch sink errors propagate
instead of being swallowed.

Scale notes: all four queries shuffle on (window×symbol) or not at all;
state is bounded by the watermarks. On a real cluster each query is an
independent job — checkpoint isolation (one dir per query) is what makes
the fan-out restartable per-query, exactly like the reference's four S3A
checkpoint paths (:128,137,178,190).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from stock_streaming_data_pipeline_spark.operators.ohlc import bar_aggs
from stock_streaming_data_pipeline_spark.streaming import sinks


@dataclass
class FanOut:
    """Handles for the four running queries + their output locations."""

    out_dir: str
    queries: list[StreamingQuery] = field(default_factory=list)

    def path(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def await_all(self) -> None:
        for q in self.queries:
            q.processAllAvailable()

    def await_any(self, timeout_s: float | None = None) -> bool:
        """Block until any of the four queries terminates —
        ``spark.streams.awaitAnyTermination`` (the reference blocks on four
        sequential awaitTermination calls, ProcessStockStream.py:193-196;
        T10)."""
        if not self.queries:
            return True
        mgr = self.queries[0].sparkSession.streams
        if timeout_s is None:
            mgr.awaitAnyTermination()
            return True
        return mgr.awaitAnyTermination(int(timeout_s * 1000))

    def stop_all(self) -> None:
        for q in self.queries:
            q.stop()


def derive_features(trades: DataFrame, *, window: str, slide: str, watermark: str) -> DataFrame:
    """The 30s/10s sliding feature aggregation (ProcessStockStream.py:143-161)."""
    return (
        trades.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), F.col("symbol"))
        .agg(*bar_aggs("price", "volume", "ts"))
        .select(
            F.col("symbol"),
            F.col("w.start").alias("timestamp"),
            F.col("w.end").alias("window_end"),
            F.col("total_usd_volume"),
            F.col("total_volume").alias("total_btc_volume"),
            "high",
            "low",
            "open",
            "close",
            "num_trades",
        )
    )


def start_fanout(
    trades: DataFrame,
    out_dir: str,
    *,
    tumbling_window: str = "1 minute",
    tumbling_watermark: str = "30 seconds",
    feature_window: str = "30 seconds",
    feature_slide: str = "10 seconds",
    feature_watermark: str = "10 seconds",
    available_now: bool = True,
) -> FanOut:
    """Start all four queries over one streaming trade DataFrame.

    ``available_now=True`` drains the source and settles (test/batch-replay
    mode); set False for continuous micro-batches with the reference's
    processing-time triggers.
    """
    fan = FanOut(out_dir)

    def trigger(writer, processing_time: str):
        if available_now:
            return writer.trigger(availableNow=True)
        return writer.trigger(processingTime=processing_time)

    # q1: tumbling volume → keyed upsert (update mode)
    volume = (
        trades.withWatermark("ts", tumbling_watermark)
        .groupBy(F.window("ts", tumbling_window).alias("w"), F.col("symbol"))
        .agg(
            F.sum("volume").alias("total_volume"),
            F.sum(F.col("price") * F.col("volume")).alias("total_usd_volume"),
        )
        .select(
            "symbol", F.col("w.start").alias("timestamp"),
            "total_volume", "total_usd_volume",
        )
    )
    fan.queries.append(
        trigger(
            volume.writeStream.outputMode("update").foreachBatch(
                sinks.upsert_writer(fan.path("volume_tracking"), ["symbol", "timestamp"])
            ),
            "30 seconds",
        )
        .option("checkpointLocation", fan.path("_chk/volume"))
        .queryName("volume_tracking")
        .start()
    )

    # q2: raw price ticks → keyed upsert (update mode)
    ticks = trades.select(
        "symbol",
        F.col("ts").alias("timestamp"),
        "price",
        (F.col("price") * F.col("volume")).alias("usd_volume"),
    )
    fan.queries.append(
        trigger(
            ticks.writeStream.outputMode("update").foreachBatch(
                sinks.upsert_writer(fan.path("price_tracking"), ["symbol", "timestamp"])
            ),
            "0 seconds",
        )
        .option("checkpointLocation", fan.path("_chk/price"))
        .queryName("price_tracking")
        .start()
    )

    features = derive_features(
        trades, window=feature_window, slide=feature_slide, watermark=feature_watermark
    )

    # q3: features → kafka-shaped (append mode, finalized windows only)
    kafka_out = sinks.kafka_shaped(
        features,
        key="symbol",
        value_struct=[
            "symbol", "timestamp", "total_usd_volume", "total_btc_volume",
            "high", "low", "close", "num_trades",
        ],
    )
    fan.queries.append(
        trigger(kafka_out.writeStream.outputMode("append"), "0 seconds")
        .format("parquet")
        .option("path", fan.path("btc_features"))
        .option("checkpointLocation", fan.path("_chk/features"))
        .queryName("btc_features")
        .start()
    )

    # q4: features → partitioned feature store (append mode)
    store = sinks.with_date_partitions(features, "timestamp")
    fan.queries.append(
        trigger(store.writeStream.outputMode("append"), "5 minutes")
        .format("parquet")
        .partitionBy("year", "month", "day")
        .option("path", fan.path("feature_store"))
        .option("checkpointLocation", fan.path("_chk/store"))
        .queryName("feature_store")
        .start()
    )
    return fan
