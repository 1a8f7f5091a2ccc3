"""Dense-grid gap fill + forward fill + linear interpolation.

Reference semantics: the training notebook reindexes the feature export to a
strict 10-second grid, linearly interpolating price/volume columns and
forward-filling counts (training_code/clean_data.ipynb cells 5,8; SURVEY.md
F5/J3).

Spark-first formulation:
- grid = per-key ``sequence(min, max, step)`` + ``explode`` (distributed,
  no driver loop);
- observations left-join onto the grid (range-partition-friendly equi-join);
- ffill = ``last(x, ignorenulls=True)`` over an ordered unbounded-preceding
  frame; bfill mirrors it with ``first`` over the following frame;
- linear interpolation = prev/next carried values + slope arithmetic, all
  built-in expressions (no UDF).

Scale notes: one shuffle to aggregate per grid slot, one equi-join (the
grid side is generated, already keyed), one windowed pass per key. Grids are
bounded by (span/step) per key — at 100 TB keep the step coarse enough that
the grid per key fits a task comfortably (it is one row per slot, tiny).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dense_grid(df: DataFrame, *, key: str, slot: str, step: int = 1) -> DataFrame:
    """Per-key dense integer grid spanning [min(slot), max(slot)]."""
    return (
        df.groupBy(key)
        .agg(F.min(slot).alias("_lo"), F.max(slot).alias("_hi"))
        .select(
            F.col(key),
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"), F.lit(step))).alias(slot),
        )
    )


def gap_fill(
    df: DataFrame,
    *,
    key: str,
    slot: str,
    ffill_cols: list[str] = (),
    interp_cols: list[str] = (),
    zero_cols: list[str] = (),
    step: int = 1,
) -> DataFrame:
    """Reindex ``df`` (one row per (key, slot)) onto the dense grid.

    ``ffill_cols`` forward-fill, ``interp_cols`` linearly interpolate
    between surrounding observations (falling back to nearest at the
    edges), ``zero_cols`` fill with 0 (e.g. counts of absent slots).
    """
    grid = dense_grid(df, key=key, slot=slot, step=step)
    joined = grid.join(df, [key, slot], "left")

    w_prev = Window.partitionBy(key).orderBy(slot).rowsBetween(Window.unboundedPreceding, 0)
    w_next = Window.partitionBy(key).orderBy(slot).rowsBetween(0, Window.unboundedFollowing)

    out = joined
    for c in ffill_cols:
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w_prev))
    for c in zero_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(0)))
    for c in interp_cols:
        prev_v = F.last(F.col(c), ignorenulls=True).over(w_prev)
        prev_t = F.last(_obs_slot(c, slot), ignorenulls=True).over(w_prev)
        next_v = F.first(F.col(c), ignorenulls=True).over(w_next)
        next_t = F.first(_obs_slot(c, slot), ignorenulls=True).over(w_next)
        interp = prev_v + (next_v - prev_v) * (F.col(slot) - prev_t) / (next_t - prev_t)
        out = out.withColumn(
            c,
            F.when(F.col(c).isNotNull(), F.col(c))
            .when(prev_t.isNull(), next_v)
            .when(next_t.isNull(), prev_v)
            .otherwise(interp),
        )
    return out


def _obs_slot(c: str, slot: str) -> Column:
    """Slot value only where the column was observed (non-null)."""
    return F.when(F.col(c).isNotNull(), F.col(slot))
