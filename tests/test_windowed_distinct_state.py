"""State eviction for the streaming windowed-distinct rewrite.

The dedup stage of streaming_windowed_distinct keys on the event-time
WINDOW column, so Spark evicts its state as the watermark passes each
window's end. This test drives a two-batch stream whose second batch
jumps the watermark three days forward and asserts the dedup operator's
retained state DROPS (old windows expired) instead of accumulating —
the unbounded-state failure mode the round-3 advice flagged for the
previous date-column keying.
"""

from __future__ import annotations

import datetime as dt
import tempfile

from pyspark.sql import functions as F


def test_windowed_distinct_dedup_state_evicts(spark):
    src = tempfile.mkdtemp(prefix="wd_src_")
    chk = tempfile.mkdtemp(prefix="wd_chk_")

    def mk(day: int, users: list[int]):
        return spark.createDataFrame(
            [
                ("click", dt.datetime(2024, 1, day, 6, 0, 0), u)
                for u in users
            ],
            "event_type string, ts timestamp, user_id long",
        )

    # batch 1: 50 distinct users on day 1; batch 2: 5 users on day 4 —
    # the watermark (max ts − 1h) then exceeds day 1's window end, so the
    # 50 day-1 dedup rows must be evicted.
    mk(1, list(range(50))).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("event_type string, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    windowed = stream.withWatermark("ts", "1 hour").select(
        "event_type", "user_id", F.window("ts", "1 day").alias("w")
    )
    deduped = windowed.dropDuplicates(["event_type", "w", "user_id"])
    agg = deduped.groupBy("w", "event_type").agg(
        F.count(F.lit(1)).alias("distinct_users")
    )

    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wd_state_test")
        .option("checkpointLocation", chk)
        .start()
    )
    try:
        q.processAllAvailable()
        mk(4, list(range(5))).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()

        progresses = [p for p in q.recentProgress if p["stateOperators"]]
        assert progresses, "no state operator progress recorded"

        def dedup_rows(p):
            for op in p["stateOperators"]:
                if "dedup" in op["operatorName"]:
                    return op["numRowsTotal"]
            raise AssertionError("dedup operator not in progress")

        peak = max(dedup_rows(p) for p in progresses)
        final = dedup_rows(progresses[-1])
        assert peak >= 50  # day-1 state was held while its window was open
        # after the watermark passed day 1, only day-4 state may remain
        assert final <= 5, (
            f"dedup state did not evict: final={final}, peak={peak}"
        )
    finally:
        q.stop()
