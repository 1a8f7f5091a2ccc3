"""Data-quality constraint suite — the Deequ-style verification layer a
production pipeline runs before publishing a table (completeness,
uniqueness, set membership, value ranges, cross-table referential
checks), expressed as ordinary aggregations so the whole suite costs
one pass per table plus one join per relational constraint.

Report contract: every constraint yields one row
``(check_name STRING, metric DOUBLE round-6, passed BOOLEAN)`` —
``passed`` is derived from the ROUNDED metric so the verdict is
engine-portable (the DuckDB oracles replay the same round-then-compare
rule).

Scale shape: all single-table checks for one table fold into one
aggregate over ONE scan (metrics are plain agg expressions — adding a
check adds a column, not a pass; a distinct-ratio check expands into
Spark's standard two-phase distinct aggregate but still reads the table
once); the single-row result explodes into report rows driver-free. Relational checks (referential integrity,
cross-column-across-join invariants) are each one join whose strategy
is left to stats/AQE. Nothing here collects data: the report itself is
O(#checks) rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.functions.scalars import round6


@dataclass(frozen=True)
class AggCheck:
    """One aggregate constraint: a metric expression over the table and
    a verdict predicate over the (round-6) metric."""

    name: str
    metric: Column
    passed: Callable[[Column], Column]


def completeness(col: str) -> Column:
    """Fraction of non-null values — count(col)/count(*)."""
    return F.count(col).cast("double") / F.count(F.lit(1)).cast("double")


def uniqueness(col: str) -> Column:
    """Distinct ratio — 1.0 iff the column is a key."""
    return F.countDistinct(col).cast("double") / F.count(F.lit(1)).cast("double")


def violations(pred: Column) -> Column:
    """Count of rows violating a row-level predicate."""
    return F.sum(F.when(pred, 1).otherwise(0)).cast("double")


def agg_report(df: DataFrame, checks: list[AggCheck]) -> DataFrame:
    """All checks over one table in ONE aggregate pass; the single
    metrics row explodes into (check_name, metric, passed) rows."""
    row = df.agg(
        *[c.metric.cast("double").alias(f"m{i}") for i, c in enumerate(checks)]
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("check_name"),
                round6(F.col(f"m{i}")).alias("metric"),
                c.passed(round6(F.col(f"m{i}"))).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return row.select(F.explode(entries).alias("e")).select("e.*")


def count_report(
    name: str,
    counted: DataFrame,
    *,
    passed: Callable[[Column], Column] = lambda m: m == 0,
) -> DataFrame:
    """A relational constraint: ``counted``'s row count is the metric
    (e.g. an anti-join of orphans); default verdict is zero-violations."""
    row = counted.agg(F.count(F.lit(1)).cast("double").alias("m"))
    return row.select(
        F.lit(name).alias("check_name"),
        round6(F.col("m")).alias("metric"),
        passed(round6(F.col("m"))).alias("passed"),
    )
