"""Deterministic stratified sampling — the data-mixing / language-balancing
stage of a training-data pipeline (sample each group to a cap before
tokenization).

Randomness comes from the engine-portable ``portable_hash`` of the row id
(md5-derived), never from an RNG: every engine, retry, and partitioning
produces the SAME sample — which is what makes a 100 TB sampling stage
reproducible and the DuckDB oracles able to recompute it independently.

Two physical forms:
- :func:`sample_per_group_exact` — EXACTLY ``cap`` rows per group: rank by
  hash within the group, keep the lowest ranks. One shuffle keyed by the
  group; a pathologically hot group funnels through one task's sort, so
  at web scale pre-filter with the rate form first (standard two-phase
  top-k-by-random-order).
- :func:`sample_per_group_rate` — keep each row iff
  ``hash(id) mod M < rate * M``: map-only after a broadcast of per-group
  counts, no shuffle of the fact table at all; group sizes are binomial
  around the target (the usual at-scale tradeoff). Pure integer
  arithmetic (no double rounding) so both engines agree exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators.dedup import (
    portable_hash,
    sql_portable_hash,
)

_M = 1_000_000  # hash-to-uniform resolution


def sample_per_group_exact(
    df: DataFrame, *, id_col: str, group_col: str, cap: int
) -> DataFrame:
    """Exactly ``min(cap, |group|)`` rows per group, chosen by hash order
    (uniform-without-replacement under the hash's uniformity; ties broken
    by id, so fully deterministic)."""
    h = F.pmod(portable_hash(F.col(id_col).cast("string"), salt="smp_"), F.lit(_M))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= cap)
    )


def sql_sample_per_group_exact(
    *, id_col: str, group_col: str, cap: int, select: str, table: str
) -> str:
    """DuckDB mirror: identical hash, identical ranking."""
    h = sql_portable_hash(f"{id_col}::VARCHAR", "smp_")
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {group_col}
    ORDER BY ({h}) % {_M} ASC, {id_col} ASC
  ) AS sample_rank
  FROM {table}
)
SELECT {select}, sample_rank FROM ranked WHERE sample_rank <= {cap}
"""


def sample_per_group_rate(
    df: DataFrame, *, id_col: str, group_col: str, cap: int
) -> DataFrame:
    """Map-only stratified sampling: per-group keep-rate ``cap/|group|``
    applied as an integer hash threshold ``hash*|group| < cap*M``. The
    per-group counts are a tiny broadcast; the fact table never shuffles.
    Group sizes land binomially around ``cap`` (exact at-most-cap needs
    the exact form)."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_grp_n"))
    h = F.pmod(portable_hash(F.col(id_col).cast("string"), salt="smp_"), F.lit(_M))
    return (
        df.join(F.broadcast(counts), group_col)
        .filter(h * F.col("_grp_n") < F.lit(cap) * F.lit(_M))
        .drop("_grp_n")
    )


def sql_sample_per_group_rate(
    *, id_col: str, group_col: str, cap: int, select: str, table: str
) -> str:
    h = sql_portable_hash(f"t.{id_col}::VARCHAR", "smp_")
    return f"""
WITH counts AS (
  SELECT {group_col}, count(*)::BIGINT AS grp_n FROM {table} GROUP BY {group_col}
)
SELECT {select}
FROM {table} t JOIN counts c USING ({group_col})
WHERE (({h}) % {_M}) * c.grp_n < {cap}::BIGINT * {_M}
"""
