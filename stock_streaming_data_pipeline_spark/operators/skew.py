"""Skew-mitigation join: salting for hot keys.

AQE's skew-join handling splits oversized SORT-MERGE partitions at runtime,
but it cannot help when the skew is structural (one key = 30% of the fact
table) and the join is key-colocated downstream. Salting is the classic
manual remedy: spread each hot fact key over S salt buckets and replicate
the (small) build side S times.

Semantics are identical to the plain join; the test suite pins equality.
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

    fact gets a deterministic per-row salt in [0, S); dim is exploded to
    all S salt values. The join key becomes (key, salt) — the hot key's
    rows now land in S different shuffle partitions.
    """
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salts))
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
