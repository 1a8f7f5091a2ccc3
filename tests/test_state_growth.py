"""Streaming state-size evidence under long replays (round-6 item #6).

The stateful operators are correctness-green, but correctness says
nothing about state GROWTH: an unbounded stream served by an operator
whose state grows with input length eventually OOMs the state store.
These tests drive a 100-micro-batch file-source replay (one file per
trigger, files ordered by event time so the watermark advances the way
a live stream's would) and read per-batch `numRowsTotal` from the
progress events (streaming/monitor.ProgressCollector), asserting the
bound each operator's design claims:

- `running_total` (applyInPandasWithState): state = ONE row per key,
  independent of replay length — rows ≤ |keys| in every batch.
- windowed distinct (dropDuplicates-on-window + windowed count): state
  is watermark-evicted — max live rows stays a small multiple of the
  per-horizon distinct count, nowhere near the whole-history count an
  eviction bug would accumulate.

Measured numbers are quoted in SCALE.md.
"""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.sources.streams import events_as_trades
from stock_streaming_data_pipeline_spark.streaming import state as stream_state
from stock_streaming_data_pipeline_spark.streaming.monitor import ProgressCollector
from tests.conftest import SF_CORRECT

N_FILES = 100


@pytest.fixture(scope="module")
def replay_dir(tmp_path_factory):
    """sf0.01 events re-materialized as N_FILES time-ordered parquet
    chunks with strictly increasing mtimes, so maxFilesPerTrigger=1
    replays them one micro-batch per file in event-time order."""
    import duckdb

    out = tmp_path_factory.mktemp("replay")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW ev AS SELECT * FROM "
        f"read_parquet('{SF_CORRECT}/events.parquet') ORDER BY ts"
    )
    n = con.execute("SELECT count(*) FROM ev").fetchone()[0]
    per = (n + N_FILES - 1) // N_FILES
    base = time.time() - N_FILES * 2
    for i in range(N_FILES):
        path = str(out / f"chunk-{i:03d}.parquet")
        con.execute(
            f"COPY (SELECT * FROM ev ORDER BY ts LIMIT {per} OFFSET {i * per}) "
            f"TO '{path}' (FORMAT parquet)"
        )
        os.utime(path, (base + i, base + i))
    return str(out)


def _stream_chunks(spark, replay_dir):
    from pyspark.sql import types as T

    from stock_streaming_data_pipeline_spark.sources.streams import _events_schema
    from stock_streaming_data_pipeline_spark.tables import (
        _timestamp_read_confs,
        load_table,
    )

    _timestamp_read_confs(spark)
    stored = load_table(spark, SF_CORRECT, "events").schema["ts"].dataType
    raw = (
        spark.readStream.schema(_events_schema(stored))
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(replay_dir)
    )
    if isinstance(stored, T.LongType):  # raw-nanos testdata generation
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return raw


def _drive(spark, sdf, mode: str) -> list[dict]:
    """Run to completion under availableNow (which honors
    maxFilesPerTrigger, so the replay really is one batch per file) and
    return the per-batch progress records."""
    collector = ProgressCollector(capacity=4 * N_FILES)
    spark.streams.addListener(collector)
    try:
        q = (
            sdf.writeStream.outputMode(mode)
            .format("noop")
            .trigger(availableNow=True)
            .option("checkpointLocation", os.path.join(os.environ.get("TMPDIR", "/tmp"), f"chk_growth_{time.time_ns()}"))
            .start()
        )
        assert q.awaitTermination(600), "replay did not finish in 600s"
        q.stop()
        # listener delivery is async — wait for the terminal batch
        deadline = time.time() + 30
        while time.time() < deadline:
            rows = [r for r in collector._events]
            if len(rows) >= N_FILES:
                break
            time.sleep(0.5)
    finally:
        spark.streams.removeListener(collector)
    rows = [r for r in collector._events if r["num_input_rows"] > 0]
    return rows


def test_running_total_state_is_one_row_per_key(spark, replay_dir):
    trades = events_as_trades(_stream_chunks(spark, replay_dir))
    totals = stream_state.running_total(
        trades, key="symbol", ts="ts", value="volume", out="cumulative_volume"
    )
    progress = _drive(spark, totals, "append")
    n_keys = 5  # event types in the testdata
    assert len(progress) >= 0.9 * N_FILES, f"only {len(progress)} batches"
    peak = max(r["state_rows"] for r in progress)
    assert peak <= n_keys, f"state grew past |keys|: peak={peak}"
    # and it must REACH |keys| (all keys seen) — a 0-row store would mean
    # the listener read the wrong operator
    assert peak == n_keys
    print(f"running_total: {len(progress)} batches, state rows peak={peak}")


def test_windowed_distinct_state_evicts_under_watermark(spark, replay_dir, duck):
    import duckdb

    con = duckdb.connect()
    total_triples, per_2day_max = con.execute(
        f"""
        WITH t AS (SELECT event_type, date_trunc('day', ts) AS d, user_id
                   FROM read_parquet('{SF_CORRECT}/events.parquet')
                   GROUP BY 1, 2, 3),
        per_day AS (SELECT d, count(*) AS c FROM t GROUP BY 1),
        pairs AS (SELECT c + coalesce(lead(c) OVER (ORDER BY d), 0) AS c2
                  FROM per_day)
        SELECT (SELECT count(*) FROM t), (SELECT max(c2) FROM pairs)
        """
    ).fetchone()

    ev = _stream_chunks(spark, replay_dir).select("event_type", "ts", "user_id")
    windowed = ev.withWatermark("ts", "1 hour").select(
        "event_type", "user_id", F.window("ts", "1 day").alias("w")
    )
    deduped = windowed.dropDuplicates(["event_type", "w", "user_id"])
    agg = deduped.groupBy("w", "event_type").agg(
        F.count(F.lit(1)).alias("distinct_users")
    )
    progress = _drive(spark, agg, "append")
    assert len(progress) >= 0.9 * N_FILES, f"only {len(progress)} batches"
    peak = max(r["state_rows"] for r in progress)
    final = progress[-1]["state_rows"]
    # Eviction bound: live state (dedup rows + agg rows) must stay within
    # the 2-day horizon's distinct count (1-day windows + 1h watermark =
    # at most 2 calendar-day windows unfinalized at once) plus the agg's
    # window rows — far below the whole-history count an eviction bug
    # would reach. Allow 1.5x slack for watermark-commit lag (state drops
    # one batch AFTER the watermark passes the window end).
    bound = 1.5 * (per_2day_max + 3 * 5)
    assert peak <= bound, (
        f"dedup/agg state peak {peak} exceeds horizon bound {bound:.0f} "
        f"(whole-history accumulation would reach ~{total_triples})"
    )
    assert peak < 0.25 * total_triples
    # steady state, not monotone growth: the final batch's state must sit
    # at the horizon level too, not at a replay-length-proportional level
    assert final <= bound
    print(
        f"windowed_distinct: {len(progress)} batches, peak={peak}, "
        f"final={final}, horizon bound={bound:.0f}, history={total_triples}"
    )


@pytest.fixture(scope="module")
def doc_replay_dir(tmp_path_factory):
    """documents re-materialized as 20 chunks for token-state replays."""
    import duckdb

    out = tmp_path_factory.mktemp("doc_replay")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW d AS SELECT * FROM "
        f"read_parquet('{SF_CORRECT}/documents.parquet') ORDER BY doc_id"
    )
    n = con.execute("SELECT count(*) FROM d").fetchone()[0]
    files = 20
    per = (n + files - 1) // files
    base = time.time() - files * 2
    for i in range(files):
        path = str(out / f"chunk-{i:02d}.parquet")
        con.execute(
            f"COPY (SELECT * FROM d ORDER BY doc_id LIMIT {per} OFFSET {i * per}) "
            f"TO '{path}' (FORMAT parquet)"
        )
        os.utime(path, (base + i, base + i))
    return str(out)


def test_streaming_heavy_hitter_state_is_vocab_bounded(spark, doc_replay_dir):
    """The complete-mode per-term count fold's state must equal the
    VOCABULARY size — flat across the replay, never the token count
    (the mergeable-count property streaming_heavy_hitters claims)."""
    import duckdb

    from stock_streaming_data_pipeline_spark.operators.dedup import tokens
    from stock_streaming_data_pipeline_spark.sources.streams import (
        DOCUMENTS_SCHEMA,
    )

    vocab = duckdb.sql(
        "SELECT count(DISTINCT term) FROM (SELECT unnest(list_filter("
        "regexp_split_to_array(lower(text), '\\s+'), t -> t <> '')) AS term "
        f"FROM read_parquet('{SF_CORRECT}/documents.parquet'))"
    ).fetchone()[0]
    raw = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(doc_replay_dir)
    )
    cnt = raw.select(F.explode(tokens(F.col("text"))).alias("term")).groupBy(
        "term"
    ).agg(F.count(F.lit(1)).alias("occ"))
    progress = _drive(spark, cnt, "complete")
    rows = [r["state_rows"] for r in progress if r["state_rows"] > 0]
    assert rows, "no stateful progress recorded"
    # state never exceeds the vocabulary, and settles exactly on it
    assert max(rows) <= vocab
    assert rows[-1] == vocab
