"""Skew-mitigation join: salting for hot keys.

AQE's skew-join handling splits oversized SORT-MERGE partitions at runtime,
but it cannot help when the skew is structural (one key = 30% of the fact
table) and the join is key-colocated downstream. Salting is the classic
manual remedy: spread each hot fact key over S salt buckets and replicate
the (small) build side S times.

Semantics are identical to the plain join for the supported join types
(inner / left / left_semi / left_anti — fact-preserving joins); the test
suite pins equality. Outer-on-dim types (right / full) are rejected: the
dim side is exploded S-fold, so every unmatched dim row would be emitted
S times.
Use when: fact⋈dim with a known/measured hot-key set, dim small enough to
replicate S-fold (it usually is — salting only makes sense when dim is the
small side anyway).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    *,
    fact_key: str,
    dim_key: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join fact⋈dim on key with S-way salting of the fact side.

    fact gets a per-row salt in [0, S) (partition-layout-dependent value,
    result-invariant — see inline note); dim is exploded to all S salt
    values. The join key becomes (key, salt) — the hot key's rows now
    land in S different shuffle partitions.

    Only fact-preserving join types are supported: with the dim side
    replicated S-fold, a right/full outer join would emit every unmatched
    dim row S times.
    """
    supported = {"inner", "left", "leftouter", "left_outer",
                 "left_semi", "leftsemi", "semi",
                 "left_anti", "leftanti", "anti"}
    if how.lower() not in supported:
        raise ValueError(
            f"salted_join: unsupported how={how!r}; the dim side is "
            f"replicated {salts}x, so outer-on-dim join types (right/full) "
            "would duplicate unmatched dim rows. Use one of "
            "inner/left/left_semi/left_anti."
        )
    # Per-row salt from monotonically_increasing_id, NOT a hash of the
    # fact columns: hashing every column forced the scan to read the
    # FULL fact row (defeating parquet column pruning — 11-wide lineitem
    # read for a 2-column query; caught by the round-8 pruning lint).
    # The id varies within a hot key (spreading it across salt buckets),
    # reads zero data columns, and although its VALUE depends on the
    # partition layout, the join RESULT is salt-assignment-invariant:
    # the dim side carries every salt value, so any row joins its dim
    # match under any salt — equality to the plain join is pinned in
    # tests/test_scale_ops.py.
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(salts))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(salts)]))
    )
    out = salted_fact.join(
        salted_dim,
        (salted_fact[fact_key] == salted_dim[dim_key])
        & (salted_fact["_salt"] == salted_dim["_salt"]),
        how,
    )
    return out.drop("_salt")
