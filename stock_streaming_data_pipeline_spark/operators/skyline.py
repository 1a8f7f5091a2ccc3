"""2-D skyline (Pareto frontier) via domain-bounded level sweep.

The skyline of a point set under (minimize x, maximize y) is the set of
points not DOMINATED by any other: A dominates B iff A.x <= B.x and
A.y >= B.y with at least one strict. Dominance analysis is a curation
primitive the reference pipeline (a windowed-aggregation Spark job,
/root/reference/scripts/StreamProcessing/ProcessStockStream.py) has no
counterpart for: pick the non-dominated (cheapest-for-quality) corpus
sources, price/size-efficient parts, latency/recall-optimal ANN
configurations.

Spark-first shape — no per-row UDF, no quadratic pair join:

1. collapse to x-levels: ``groupBy(x).agg(max(y))`` — map-side
   combinable, output bounded by ``|domain(x)|``;
2. one ordered window over the LEVEL relation computes, per level, the
   best y at any strictly smaller x;
3. join back: a row survives iff its y equals its level's max and
   beats every cheaper level's max.

The only global-ordering step runs on the level relation, so the
100 TB story requires a bounded x-domain (price cents, integer sizes,
bucketed scores — true for every catalog use). For genuinely unbounded
x, pre-bucket x or take per-partition skylines first (each partition's
skyline is a superset filter of the global one) — documented contract,
not silently assumed: the caller picks the level column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, *, min_col: str, max_col: str) -> DataFrame:
    """Rows of ``df`` on the (minimize ``min_col``, maximize ``max_col``)
    skyline. Ties duplicated on both coordinates are all kept (neither
    dominates). Input columns pass through unchanged."""
    lv = df.groupBy(min_col).agg(F.max(max_col).alias("_lvl_max"))
    w = (
        Window.orderBy(min_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lv = lv.withColumn("_prev_max", F.max("_lvl_max").over(w))
    return (
        df.join(lv, min_col)
        .filter(
            (F.col(max_col) == F.col("_lvl_max"))
            & (
                F.col("_prev_max").isNull()
                | (F.col("_prev_max") < F.col(max_col))
            )
        )
        .drop("_lvl_max", "_prev_max")
    )


def brute_force_skyline(
    pts: list[tuple[int, int]],
) -> list[tuple[int, int]]:
    """O(n^2) dominance witness for unit tests."""
    out = []
    for i, (xi, yi) in enumerate(pts):
        dominated = False
        for j, (xj, yj) in enumerate(pts):
            if i == j:
                continue
            if xj <= xi and yj >= yi and (xj < xi or yj > yi):
                dominated = True
                break
        if not dominated:
            out.append((xi, yi))
    return out
