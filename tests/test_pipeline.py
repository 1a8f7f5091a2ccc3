"""End-to-end facade test: the reference's StreamingJob user journey."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.pipeline import StockPipeline
from stock_streaming_data_pipeline_spark.sources.trades import write_trades_dir


def test_pipeline_user_journey(spark, tmp_path):
    src = str(tmp_path / "trades")
    write_trades_dir(spark, src, files=3, n_rows=4000)

    pipe = StockPipeline(
        source_dir=src, out_dir=str(tmp_path / "out"), spark=spark
    ).run()
    try:
        prices = pipe.price_tracking()
        volumes = pipe.volume_tracking()
        feats = pipe.features()
        store = pipe.feature_store()

        assert prices.count() > 0 and volumes.count() > 0
        assert {"symbol", "timestamp", "high", "low", "close", "num_trades"} <= set(
            feats.columns
        )
        assert feats.filter(
            (F.col("low") > F.col("close")) | (F.col("close") > F.col("high"))
        ).count() == 0
        assert {"year", "month", "day"} <= set(store.columns)

        # maintenance compaction keeps the resolved state identical
        before = sorted(map(tuple, volumes.collect()))
        pipe.compact()
        after = sorted(map(tuple, pipe.volume_tracking().collect()))
        assert before == after
    finally:
        pipe.stop()
