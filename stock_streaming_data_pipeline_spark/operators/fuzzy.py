"""Entity resolution: blocked fuzzy matching on edit distance.

The record-linkage counterpart of the document dedup tier — catalog
cleaning, product matching, user merging all reduce to "find pairs of
short strings that are almost equal". All-pairs Levenshtein is
O(n²·m²); the classic scalable shape is BLOCKING: only compare records
that agree on cheap equality keys, pre-filter candidates with the
length-difference bound (|len(a) − len(b)| ≤ d is necessary for edit
distance ≤ d — a free column predicate that prunes before the expensive
kernel), then compute the exact distance on survivors only.

Levenshtein is an exact integer — Spark's and DuckDB's built-ins agree
by definition — so the whole operator carries a full differential
oracle, no rounding discipline needed.

Scale shape: the self-join shuffles on the blocking key (AQE skew-join
splits a hot block); the length filter rides the join condition so
candidates never materialize; the quadratic term is bounded by the
largest block (pick blocking keys accordingly — the operator reports
no pair across blocks BY DESIGN, the recall trade every blocking
scheme makes).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_pairs(
    df: DataFrame,
    *,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int = 2,
) -> DataFrame:
    """Within-block pairs (id_a < id_b) with Levenshtein ≤ ``max_dist``.
    Returns (id_a, id_b, text_a, text_b, edit_dist, blocking cols)."""
    cols = [F.col(id_col).alias("id"), F.col(text_col).alias("txt")] + [
        F.col(c) for c in block_cols
    ]
    base = df.select(*cols)
    a = base.select(
        F.col("id").alias("id_a"), F.col("txt").alias("text_a"), *block_cols
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("txt").alias("text_b"), *block_cols
    )
    joined = a.join(b, list(block_cols)).filter(
        (F.col("id_a") < F.col("id_b"))
        & (
            F.abs(F.length("text_a") - F.length("text_b"))
            <= F.lit(max_dist)
        )
    )
    return (
        joined.withColumn(
            "edit_dist", F.levenshtein(F.col("text_a"), F.col("text_b"))
        )
        .filter(F.col("edit_dist") <= max_dist)
        .select(*block_cols, "id_a", "id_b", "text_a", "text_b", "edit_dist")
    )


def sql_fuzzy_pairs(
    *,
    table: str,
    id_col: str,
    text_col: str,
    block_cols: Sequence[str],
    max_dist: int = 2,
) -> str:
    on = " AND ".join(f"a.{c} = b.{c}" for c in block_cols)
    sel = ", ".join(f"a.{c}" for c in block_cols)
    return f"""
SELECT {sel}, a.{id_col} AS id_a, b.{id_col} AS id_b,
       a.{text_col} AS text_a, b.{text_col} AS text_b,
       levenshtein(a.{text_col}, b.{text_col}) AS edit_dist
FROM {table} a JOIN {table} b
  ON {on} AND a.{id_col} < b.{id_col}
 AND abs(length(a.{text_col}) - length(b.{text_col})) <= {max_dist}
WHERE levenshtein(a.{text_col}, b.{text_col}) <= {max_dist}
"""
