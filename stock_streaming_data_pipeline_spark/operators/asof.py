"""As-of (most-recent-match) join — SURVEY.md §2.4 J1.

Reference shape: predictions written at t+10s are later aligned with the
actual price at the same (symbol, timestamp) key (BtcPrediction/
predict_btc.py:64-91); the general form is "for each left row, the latest
right row with right.ts <= left.ts for the same key".

Spark has no native as-of join. The scalable formulation used here is the
union + ordered-window carry-forward:

    union(left tagged 1, right tagged 0)
      -> window partitionBy(key) orderBy(ts, tag)
      -> last(right_value, ignorenulls=True) over rows unbounded..current
      -> filter tag == 1

One hash shuffle on the key, linear work, no join explosion — this survives
a 100x scale-up where a per-group ``pd.merge_asof`` (applyInPandas) would
bottleneck on the hottest key's single task and an inequality join would
explode. Right-before-left ordering at equal ts gives inclusive (<=)
semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    right_values: list[str],
    right_prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the most recent right row (right.on <=
    left.on) within the same ``by`` key. Unmatched rows keep nulls.

    Output = all left columns + ``{right_prefix}{on}`` (the matched right
    event time) + ``{right_prefix}{col}`` for each right value column.
    """
    carried = [on, *right_values]
    l_cols = left.columns
    l = left.withColumn("_tag", F.lit(1))
    for c in carried:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    # Align schemas: right rows carry nulls for left-only columns.
    for c in l_cols:
        if c not in (by, on):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.unionByName(r.select(l.columns))

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carried:
        unioned = unioned.withColumn(
            f"{right_prefix}{c}", F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w)
        )
    return unioned.filter(F.col("_tag") == 1).select(
        *l_cols, *[f"{right_prefix}{c}" for c in carried]
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    by: str,
    on: str,
    right_values: list[str],
    tolerance_micros: int,
    right_prefix: str = "nearest_",
) -> DataFrame:
    """For every left row, attach the right row with the smallest |Δt| in
    either direction within ``tolerance_micros``, same ``by`` key — the
    pandas ``merge_asof(direction='nearest', tolerance=...)`` contract.
    Ties (equidistant before/after) resolve to the EARLIER right row.

    Same scalable shape as :func:`asof_join`: one union, one hash shuffle
    on the key, two linear window passes (backward carry-forward for the
    most recent right row, forward carry-backward for the next one), then
    a per-row arm pick. No inequality-join explosion — a candidate join
    bounded by tolerance would be O(left x right-in-window) per key and
    die on hot keys at 100 TB; this stays O(n log n) in the sort.
    """
    carried = [on, *right_values]
    l_cols = left.columns
    l = left.withColumn("_tag", F.lit(1))
    for c in carried:
        l = l.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r = right.select(
        F.col(by),
        F.col(on),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_r_{c}") for c in carried],
    )
    for c in l_cols:
        if c not in (by, on):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.unionByName(r.select(l.columns))

    # Right rows at equal ts sort before the left row, so the backward
    # frame is inclusive (dist 0 matches land on the prev arm).
    order = [F.col(on).asc(), F.col("_tag").asc()]
    w_prev = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(by)
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    for c in carried:
        unioned = unioned.withColumn(
            f"_prev_{c}", F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w_prev)
        ).withColumn(
            f"_next_{c}", F.first(F.col(f"_r_{c}"), ignorenulls=True).over(w_next)
        )

    us = lambda col: F.unix_micros(F.col(col))  # noqa: E731
    dist_prev = us(on) - us(f"_prev_{on}")
    dist_next = us(f"_next_{on}") - us(on)
    ok_prev = F.col(f"_prev_{on}").isNotNull() & (dist_prev <= tolerance_micros)
    ok_next = F.col(f"_next_{on}").isNotNull() & (dist_next <= tolerance_micros)
    take_prev = ok_prev & (~ok_next | (dist_prev <= dist_next))
    out = unioned.filter(F.col("_tag") == 1)
    for c in carried:
        out = out.withColumn(
            f"{right_prefix}{c}",
            F.when(take_prev, F.col(f"_prev_{c}")).when(
                ok_next, F.col(f"_next_{c}")
            ),
        )
    return out.select(*l_cols, *[f"{right_prefix}{c}" for c in carried])
