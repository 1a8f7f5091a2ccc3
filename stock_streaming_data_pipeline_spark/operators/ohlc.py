"""Windowed OHLC-style bar aggregation (the reference's centerpiece).

Reference semantics: a sliding-window grouped aggregation producing
``total_usd_volume, total_btc_volume, high, low, close, num_trades``
per (window, symbol) — scripts/StreamProcessing/ProcessStockStream.py:143-161
(sliding 30s/10s) and :115-119 (tumbling 1 min volume).

Engine divergence, deliberate: the reference computes ``close`` with
``last(price)`` which is arrival-order-dependent (nondeterministic in a
distributed shuffle). We pin it by event time with ``max_by(price, ts)``
(SURVEY.md §2.5 A2). Same for an explicit ``open`` via ``min_by``.

Scale notes (100 TB): this is a single shuffle on (window, key) — Catalyst
plans a partial (map-side) HashAggregate before the exchange, so the shuffle
volume is one row per (window, key) per input partition, not per event. A
sliding window multiplies input by window/slide via the internal window
expansion; keep that ratio small (<=6 here). No driver-side work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bar_aggs(price: str, volume: str | None, ts: str) -> list[Column]:
    """The six reference aggregates (ProcessStockStream.py:147-152),
    with event-time-deterministic open/close."""
    aggs = [
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.expr(f"min_by({price}, {ts})").alias("open"),
        F.expr(f"max_by({price}, {ts})").alias("close"),
        F.count(F.lit(1)).alias("num_trades"),
    ]
    if volume is not None:
        aggs = [
            F.sum(volume).alias("total_volume"),
            F.sum(F.col(price) * F.col(volume)).alias("total_usd_volume"),
            *aggs,
        ]
    return aggs


def sliding_bars(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    price: str,
    volume: str | None = None,
    window: str = "30 seconds",
    slide: str | None = "10 seconds",
) -> DataFrame:
    """Sliding (or tumbling when ``slide`` is None) OHLC bars per key.

    Returns one row per (window, key) with ``window_start``/``window_end``
    timestamps plus the bar aggregates. Works identically on batch and
    streaming DataFrames (add a watermark upstream for streaming).
    """
    win = F.window(ts, window, slide) if slide else F.window(ts, window)
    out = (
        df.groupBy(win.alias("w"), F.col(key))
        .agg(*bar_aggs(price, volume, ts))
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )
    return out


def tumbling_volume(
    df: DataFrame,
    *,
    key: str,
    ts: str,
    volume: str,
    usd_volume: str | None = None,
    window: str = "1 minute",
) -> DataFrame:
    """The reference's 1-minute tumbling volume aggregation
    (ProcessStockStream.py:115-123)."""
    aggs = [F.sum(volume).alias("total_volume"), F.count(F.lit(1)).alias("num_trades")]
    if usd_volume is not None:
        aggs.insert(1, F.sum(usd_volume).alias("total_usd_volume"))
    return (
        df.groupBy(F.window(ts, window).alias("w"), F.col(key))
        .agg(*aggs)
        .withColumn("window_start", F.col("w.start"))
        .withColumn("window_end", F.col("w.end"))
        .drop("w")
    )
