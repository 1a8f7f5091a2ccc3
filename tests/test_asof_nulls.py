"""NULL-carried-value semantics of the as-of joins (round-2 ADVICE item).

A right row whose carried column is NULL must still be the match — its
NULL must surface in the output rather than being back-filled from an
older (possibly out-of-tolerance) right row, and a NULL value must not be
conflated with "no match".
"""

from __future__ import annotations

import datetime as dt

import pandas as pd

from stock_streaming_data_pipeline_spark.operators.asof import (
    asof_join,
    asof_join_nearest,
)


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [("A", _ts(10)), ("A", _ts(30))], "sym string, ts timestamp"
    )
    # ts=9: price NULL but qty 7 (the nearest row for left ts=10)
    # ts=2: both non-null (must NOT leak into the ts=10 match)
    # ts=29: qty NULL, price 5.0 (nearest for left ts=30)
    right = spark.createDataFrame(
        [
            ("A", _ts(2), 1.0, 3.0),
            ("A", _ts(9), None, 7.0),
            ("A", _ts(29), 5.0, None),
        ],
        "sym string, ts timestamp, price double, qty double",
    )
    return left, right


def test_asof_join_carries_whole_row_with_nulls(spark):
    left, right = _frames(spark)
    out = (
        asof_join(left, right, by="sym", on="ts", right_values=["price", "qty"])
        .orderBy("ts")
        .toPandas()
    )
    # left ts=10 matches right ts=9: price NULL (not 1.0 from ts=2), qty 7
    assert out.loc[0, "asof_ts"] == _ts(9)
    assert pd.isna(out.loc[0, "asof_price"])
    assert out.loc[0, "asof_qty"] == 7.0
    # left ts=30 matches right ts=29: price 5, qty NULL (not 7.0 from ts=9)
    assert out.loc[1, "asof_ts"] == _ts(29)
    assert out.loc[1, "asof_price"] == 5.0
    assert pd.isna(out.loc[1, "asof_qty"])


def test_asof_nearest_carries_whole_row_with_nulls(spark):
    left, right = _frames(spark)
    out = (
        asof_join_nearest(
            left,
            right,
            by="sym",
            on="ts",
            right_values=["price", "qty"],
            tolerance_micros=3_000_000,
        )
        .orderBy("ts")
        .toPandas()
    )
    # Nearest to ts=10 within 3s is ts=9 (NULL price must survive; the
    # ts=2 row is outside tolerance and must not be stitched in).
    assert out.loc[0, "nearest_ts"] == _ts(9)
    assert pd.isna(out.loc[0, "nearest_price"])
    assert out.loc[0, "nearest_qty"] == 7.0
    # Nearest to ts=30 is ts=29; its NULL qty must not fall back to 7.0.
    assert out.loc[1, "nearest_ts"] == _ts(29)
    assert out.loc[1, "nearest_price"] == 5.0
    assert pd.isna(out.loc[1, "nearest_qty"])


def test_asof_nearest_no_match_outside_tolerance(spark):
    left, right = _frames(spark)
    out = (
        asof_join_nearest(
            left.filter("ts = timestamp'2024-01-01 00:00:30'"),
            right.filter("ts = timestamp'2024-01-01 00:00:02'"),
            by="sym",
            on="ts",
            right_values=["price", "qty"],
            tolerance_micros=1_000_000,
        )
        .toPandas()
    )
    assert pd.isna(out.loc[0, "nearest_ts"])
    assert pd.isna(out.loc[0, "nearest_price"])
    assert pd.isna(out.loc[0, "nearest_qty"])


def test_asof_join_forward_inclusive_and_null_carry(spark):
    """direction='forward' picks the EARLIEST right row at-or-after each
    left row (inclusive at equal ts), carries whole rows (NULL values
    surface, never back-filled from a later row), and leaves rows with
    no following right row unmatched."""
    left = spark.createDataFrame(
        [("A", _ts(9)), ("A", _ts(10)), ("A", _ts(40))],
        "sym string, ts timestamp",
    )
    # ts=9: NULL price (the forward match for left ts=9 — equal ts, inclusive)
    # ts=29: price 5.0 (the forward match for left ts=10)
    right = spark.createDataFrame(
        [("A", _ts(9), None), ("A", _ts(29), 5.0)],
        "sym string, ts timestamp, price double",
    )
    out = (
        asof_join(
            left, right, by="sym", on="ts", right_values=["price"],
            right_prefix="next_", direction="forward",
        )
        .orderBy("ts")
        .toPandas()
    )
    assert list(out["next_ts"])[:2] == [_ts(9), _ts(29)]
    assert pd.isna(out["next_ts"][2])
    assert pd.isna(out["next_price"][0])  # equal-ts NULL carried
    assert out["next_price"][1] == 5.0
    assert pd.isna(out["next_price"][2])  # nothing after ts=40


def test_asof_join_forward_rejects_bad_direction(spark):
    left, right = _frames(spark)
    import pytest

    with pytest.raises(ValueError):
        asof_join(
            left, right, by="sym", on="ts", right_values=["price"],
            direction="sideways",
        )
