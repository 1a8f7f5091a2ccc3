"""Stateful streaming operators vs their batch window-function semantics.

The running total and fixed-N lookback (SURVEY T11/W1/W2) must match the
batch formulation exactly, including across micro-batch boundaries (state
continuity) — driven over a multi-file replay so several real batches run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.sources.streams import stream_trades
from stock_streaming_data_pipeline_spark.sources.trades import write_trades_dir
from stock_streaming_data_pipeline_spark.streaming import state as stream_state


@pytest.fixture(scope="module")
def trades_small(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("trades_state"))
    # no late rows: state fold order must equal event-time order for the
    # batch equivalence to be exact across batch boundaries
    batch = write_trades_dir(
        spark, path, files=3, n_rows=3000, late_fraction=0.0
    )
    return path, batch


def _settle_append(sdf, spark, tmp_path, name):
    chk = str(tmp_path / f"chk_{name}")
    q = (
        sdf.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        q.stop()
    return spark.table(name)


def test_running_total_matches_batch(spark, trades_small, tmp_path):
    path, batch = trades_small
    out = stream_state.running_total(
        stream_trades(spark, path), key="symbol", ts="ts", value="volume",
        out="cumulative_volume",
    )
    got = _settle_append(out, spark, tmp_path, "state_running").toPandas()

    w = (
        Window.partitionBy("symbol")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = (
        batch.withColumn("cumulative_volume", F.sum("volume").over(w))
        .select("symbol", "ts", "volume", "cumulative_volume")
        .toPandas()
    )
    key = ["symbol", "ts", "volume"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["cumulative_volume"] - want["cumulative_volume"]).abs().max() < 1e-9


def test_running_total_monotone(spark, trades_small, tmp_path):
    path, _ = trades_small
    got = spark.table("state_running").toPandas()
    for _, g in got.sort_values("ts").groupby("symbol"):
        assert g["cumulative_volume"].is_monotonic_increasing


def test_trailing_lookback_matches_batch(spark, trades_small, tmp_path):
    path, batch = trades_small
    out = stream_state.trailing_lookback(
        stream_trades(spark, path), key="symbol", ts="ts", value="price", rows=5
    )
    got = _settle_append(out, spark, tmp_path, "state_lookback").toPandas()

    w = Window.partitionBy("symbol").orderBy("ts").rowsBetween(-4, 0)
    want = (
        batch.select(
            "symbol", "ts", F.col("price"),
            F.avg("price").over(w).alias("lookback_mean"),
            F.min("price").over(w).alias("lookback_min"),
            F.max("price").over(w).alias("lookback_max"),
            F.count(F.lit(1)).over(w).alias("lookback_n"),
        )
        .toPandas()
    )
    key = ["symbol", "ts"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want)
    for c in ["lookback_mean", "lookback_min", "lookback_max"]:
        assert (got[c] - want[c]).abs().max() < 1e-9
    assert (got["lookback_n"] == want["lookback_n"]).all()


def test_lookback_emit_ready_only(spark, trades_small, tmp_path):
    path, batch = trades_small
    out = stream_state.trailing_lookback(
        stream_trades(spark, path), key="symbol", ts="ts", value="price",
        rows=5, emit_ready_only=True,
    )
    got = _settle_append(out, spark, tmp_path, "state_ready")
    n_src = batch.count()
    n_sym = batch.select("symbol").distinct().count()
    # first rows-1 rows per key withheld (kafka.py:42-50 behavior)
    assert got.count() == n_src - n_sym * 4
    assert got.filter(F.col("lookback_n") < 5).count() == 0
