"""Streaming throughput benchmark: rows/sec through the four-query fan-out.

The reference's whole topology (ProcessStockStream.py:91-196 — tumbling
volume upsert, tick upsert, sliding OHLC to a kafka-shaped sink, and the
partitioned feature store) sustained ~1 feature row / 10 s from its live
feed (BASELINE.md "observed data rate"). This harness replays N synthetic
trades through OUR four concurrent streaming queries end-to-end (decode →
watermark → windowed agg → sink, per-query checkpoints) and reports input
rows per second of wall clock — the engine-throughput number the
reference never measured.

Deliberately separate from bench.py: the driver's one-line-JSON contract
for batch queries stays untouched. Prints ONE JSON line:
    {"metric": "streaming_fanout_rows_per_sec", "value": N, ...}

Usage: python tools/bench_streaming.py [--rows 1000000] [--files 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--files", type=int, default=8)
    args = ap.parse_args()

    from stock_streaming_data_pipeline_spark.session import get_spark
    from stock_streaming_data_pipeline_spark.sources import streams, trades
    from stock_streaming_data_pipeline_spark.streaming.jobs import start_fanout

    spark = get_spark("bench-streaming")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm-up

    work = tempfile.mkdtemp(prefix="bench_stream_")
    try:
        src_dir = os.path.join(work, "trades_src")
        # Generation is outside the measured window (the producer is
        # transport, not engine — SURVEY §2.1 S3).
        trades.write_trades_dir(
            spark, src_dir, files=args.files, n_rows=args.rows, cadence_ms=50
        )

        stream = streams.stream_trades(spark, src_dir)
        t0 = time.time()
        fan = start_fanout(stream, os.path.join(work, "out"), available_now=True)
        fan.await_all()
        wall = time.time() - t0
        fan.stop_all()

        # Sanity: all four sinks produced output.
        outs = {}
        for name in ("volume_tracking", "price_tracking", "btc_features", "feature_store"):
            outs[name] = spark.read.parquet(fan.path(name)).count()
        assert all(v > 0 for v in outs.values()), outs

        print(
            json.dumps(
                {
                    "metric": "streaming_fanout_rows_per_sec",
                    "value": round(args.rows / wall, 1),
                    "unit": "rows/sec",
                    "rows": args.rows,
                    "wall_s": round(wall, 3),
                    "concurrent_queries": 4,
                    "sink_rows": outs,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
