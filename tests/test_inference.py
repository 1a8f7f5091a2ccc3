"""Inference surface: vectorized scoring, autoregressive rollout, and the
streaming predict→align flow (SURVEY EP3 restated in-engine)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import inference
from stock_streaming_data_pipeline_spark.sources.streams import stream_trades
from stock_streaming_data_pipeline_spark.sources.trades import write_trades_dir
from stock_streaming_data_pipeline_spark.streaming import sinks
from stock_streaming_data_pipeline_spark.streaming.jobs import derive_features


def test_autoregressive_rollout_deterministic():
    history = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=6, freq="10s"),
            "price": [100.0, 101.0, 99.5, 100.5, 102.0, 101.5],
        }
    )
    out1 = inference.autoregressive_rollout(history, steps=5, lookback=4)
    out2 = inference.autoregressive_rollout(history, steps=5, lookback=4)
    assert len(out1) == 5
    assert (out1["price"] == out2["price"]).all()
    deltas = out1["ts"].diff().dropna().dt.total_seconds()
    assert (deltas == 10.0).all()
    # rolled-forward predictions feed back: later steps depend on earlier
    assert out1["price"].nunique() > 1


def test_streaming_predict_align_flow(spark, tmp_path):
    """features stream → foreachBatch scoring → prediction upsert at
    t+horizon (60s, past the watermark cut so the newest rows are half-filled) → full-outer align with actuals: the btc_predict lifecycle
    with its half-filled newest rows."""
    trades_dir = str(tmp_path / "trades")
    write_trades_dir(spark, trades_dir, files=2, n_rows=2000, late_fraction=0.0)

    feats = derive_features(
        stream_trades(spark, trades_dir),
        window="30 seconds", slide="10 seconds", watermark="10 seconds",
    )
    pred_path = str(tmp_path / "predictions")
    model = inference.default_model()

    def score_batch(batch_df, epoch_id):
        scored = inference.score(
            batch_df.select(
                "symbol",
                (F.col("timestamp") + F.expr("INTERVAL 60 SECONDS")).alias("timestamp"),
                F.col("high").alias("f_avg"),
                F.col("low").alias("f_min"),
                F.col("high").alias("f_max"),
                F.col("close").alias("f_last"),
            ),
            feature_cols=["f_avg", "f_min", "f_max", "f_last"],
            model=model,
        )
        sinks.upsert_writer(pred_path, ["symbol", "timestamp"])(scored, epoch_id)

    q = (
        feats.writeStream.outputMode("append")
        .foreachBatch(score_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    q.awaitTermination(300)

    preds = sinks.read_upsert_table(spark, pred_path, ["symbol", "timestamp"])
    assert preds.count() > 0
    assert preds.filter(F.col("predict_price").isNull()).count() == 0

    # align with "actuals" = the features' close at window start
    actuals = (
        derive_features(
            stream_trades(spark, trades_dir),
            window="30 seconds", slide="10 seconds", watermark="10 seconds",
        )
    )
    # batch equivalent of actuals for the join:
    from stock_streaming_data_pipeline_spark.operators.ohlc import sliding_bars

    batch_trades = spark.read.parquet(trades_dir)
    actual_bars = sliding_bars(
        batch_trades, key="symbol", ts="ts", price="price", volume="volume",
        window="30 seconds", slide="10 seconds",
    ).select(
        "symbol", F.col("window_start").alias("timestamp"),
        F.col("close").alias("curr_price"),
    )
    aligned = inference.align_predictions(
        preds.select("symbol", "timestamp", "predict_price"),
        actual_bars, key="symbol", ts="timestamp",
    )
    both = aligned.filter(
        F.col("predict_price").isNotNull() & F.col("curr_price").isNotNull()
    )
    only_pred = aligned.filter(
        F.col("predict_price").isNotNull() & F.col("curr_price").isNull()
    )
    assert both.count() > 0  # matured predictions got their actual
    assert only_pred.count() > 0  # newest horizon rows still half-filled
    q.stop()


def test_scorer_vectorized_matches_python(spark):
    model = inference.default_model()
    pdf = pd.DataFrame(
        {"f_avg": [1.0, 2.0], "f_min": [0.5, 1.0], "f_max": [2.0, 3.0], "f_last": [1.5, 2.5]}
    )
    df = spark.createDataFrame(pdf)
    got = (
        inference.score(df, feature_cols=["f_avg", "f_min", "f_max", "f_last"], model=model)
        .select("predict_price")
        .toPandas()["predict_price"]
    )
    want = model.predict(pdf)
    assert got.tolist() == pytest.approx(want.tolist())


def test_apply_in_pandas_per_key_fit_matches_expression_ols(spark):
    """Per-key model training via applyInPandas (the UD path for models
    that genuinely need Python) must agree with the expression-tier
    closed-form OLS (trend_slope_by_key's moments) on the same data —
    the two 'train per key' routes are interchangeable."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from stock_streaming_data_pipeline_spark.tables import load_table

    ev = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            ((F.unix_micros("ts") / 1_000_000).cast("long") - F.lit(1_704_067_200)).alias("x"),
            (F.signum("value") * F.floor(F.abs(F.col("value")) * 100 + F.lit(0.5)))
            .cast("long")
            .alias("y"),
        )
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = pdf["x"].to_numpy(float), pdf["y"].to_numpy(float)
        n = len(x)
        slope = (n * (x * y).sum() - x.sum() * y.sum()) / (
            n * (x * x).sum() - x.sum() ** 2
        )
        return pd.DataFrame(
            {"event_type": [pdf["event_type"].iloc[0]], "slope": [slope]}
        )

    pandas_fit = {
        r["event_type"]: r["slope"]
        for r in ev.groupBy("event_type")
        .applyInPandas(fit, "event_type string, slope double")
        .collect()
    }
    m = (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
        .collect()
    )
    for r in m:
        expr_slope = (r["n"] * r["sxy"] - r["sx"] * r["sy"]) / (
            r["n"] * r["sxx"] - r["sx"] ** 2
        )
        assert abs(pandas_fit[r["event_type"]] - expr_slope) < 1e-6 * max(
            1.0, abs(expr_slope)
        )
