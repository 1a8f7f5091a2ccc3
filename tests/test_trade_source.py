"""Custom Python DataSource (trade_gen): batch parallelism, deterministic
generation, streaming offset resume across restarts."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.sources import trade_source


def _load(spark, **opts):
    trade_source.register(spark)
    r = spark.read.format("trade_gen")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_matches_reference_generation(spark):
    df = _load(spark, n_rows=50, n_partitions=4)
    got = sorted(
        (r["trade_id"], r["symbol"], r["price"], r["qty"])
        for r in df.collect()
    )
    want = sorted(
        (i, s, p, q) for i, s, _, p, q in (trade_source.gen_row(i) for i in range(50))
    )
    assert got == want


def test_partitioning_does_not_change_data(spark):
    a = sorted(r["price"] for r in _load(spark, n_rows=40, n_partitions=1).collect())
    b = sorted(r["price"] for r in _load(spark, n_rows=40, n_partitions=7).collect())
    assert a == b
    assert _load(spark, n_rows=40, n_partitions=7).rdd.getNumPartitions() == 7


def test_stream_drains_once_and_restart_is_noop(spark, tmp_path):
    """availableNow drains the full feed in one batch; a restart on the
    same checkpoint emits NOTHING new (latest == committed) — the
    exactly-once contract across restarts."""
    trade_source.register(spark)
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "rows")

    def run_once():
        q = (
            spark.readStream.format("trade_gen")
            .option("n_rows", 90)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    run_once()
    ids = sorted(r["trade_id"] for r in spark.read.parquet(out).collect())
    assert ids == list(range(90))
    run_once()
    assert spark.read.parquet(out).count() == 90  # no duplicates


def test_stream_multi_batch_under_processing_trigger(spark, tmp_path):
    """With a per-trigger cap the source advances incrementally — real
    multi-micro-batch execution with row-range offsets."""
    import glob
    import time

    trade_source.register(spark)
    chk = str(tmp_path / "chk2")
    out = str(tmp_path / "rows2")
    q = (
        spark.readStream.format("trade_gen")
        .option("n_rows", 100)
        .option("rows_per_batch", 30)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    try:
        while time.time() < deadline:
            try:
                if spark.read.parquet(out).count() >= 100:
                    break
            except Exception:
                pass
            time.sleep(0.5)
    finally:
        q.stop()
    ids = sorted(r["trade_id"] for r in spark.read.parquet(out).collect())
    assert ids == list(range(100))
    # 100 rows at cap 30 -> at least 4 committed micro-batches
    assert len(glob.glob(f"{chk}/offsets/*")) >= 4


def test_generation_is_engine_portable(spark, duck):
    """The DuckDB replay of the generator produces byte-identical rows —
    the custom SOURCE itself is differential-checked."""
    sql = f"WITH {trade_source.sql_trade_gen(30)} SELECT * FROM trade_gen ORDER BY trade_id"
    want = duck.execute(sql).fetchall()
    got = sorted(
        (r["trade_id"], r["symbol"], r["ts"], r["price"], r["qty"])
        for r in _load(spark, n_rows=30).collect()
    )
    assert [
        (t, s, ts, p, q) for t, s, ts, p, q in want
    ] == got
