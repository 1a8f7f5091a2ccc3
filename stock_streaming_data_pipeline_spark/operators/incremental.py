"""Incremental aggregate maintenance (materialized-view refresh).

A 100 TB warehouse never recomputes yesterday's rollup from raw facts;
it MERGES the new partition's partial aggregates into the materialized
table. That works exactly when the aggregate state is mergeable —
sum/count/min/max combine associatively; avg derives from (sum, count);
the KMV sketch (operators/kmv.py) makes even distinct counts mergeable.
This module is that merge as a DataFrame op, the same partial-state
algebra Spark's own partial/final HashAggregate uses, lifted to
table-refresh granularity.

Scale shape: one co-partitioned full-outer join on the group keys —
base and delta are both aggregate-sized (groups, not facts), so the
refresh cost is independent of total history size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERGEABLE = ("sum", "count", "min", "max")


def aggregate_state(
    facts: DataFrame, *, keys: list[str], measures: dict[str, list[str]]
) -> DataFrame:
    """Partial-aggregate state for ``measures`` ({col: [fns]}) per key
    group; fns limited to the mergeable set. Column naming: f_{fn}_{col}."""
    aggs = []
    for col, fns in measures.items():
        for fn in fns:
            if fn not in MERGEABLE:
                raise ValueError(f"{fn} is not mergeable; derive it instead")
            expr = (
                F.count(col) if fn == "count" else getattr(F, fn)(F.col(col))
            )
            aggs.append(expr.alias(f"f_{fn}_{col}"))
    return facts.groupBy(*keys).agg(*aggs)


def merge_states(base: DataFrame, delta: DataFrame, *, keys: list[str]) -> DataFrame:
    """Merge two aggregate-state tables: full-outer on keys, then per
    column the mergeable combine (sum/count add, min/max fold); groups
    present on one side pass through. Output schema == input schema."""
    state_cols = [c for c in base.columns if c not in keys]
    if state_cols != [c for c in delta.columns if c not in keys]:
        raise ValueError("base/delta state schemas differ")
    b = base.select(
        *keys, *[F.col(c).alias(f"_b_{c}") for c in state_cols]
    )
    d = delta.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in state_cols]
    )
    joined = b.join(d, keys, "full_outer")
    out = []
    for c in state_cols:
        fn = c.split("_", 2)[1]
        bcol, dcol = F.col(f"_b_{c}"), F.col(f"_d_{c}")
        if fn in ("sum", "count"):
            # NULL-correct: a group whose measure is entirely NULL has
            # sum=NULL (not 0) — merged must equal a full recompute, so
            # only coalesce when at least one side carries a value.
            merged = F.when(bcol.isNull() & dcol.isNull(), F.lit(None)).otherwise(
                F.coalesce(bcol, F.lit(0)) + F.coalesce(dcol, F.lit(0))
            )
        elif fn == "min":
            merged = F.least(bcol, dcol)  # least/greatest skip NULLs
        else:
            merged = F.greatest(bcol, dcol)
        out.append(merged.alias(c))
    return joined.select(*keys, *out)
