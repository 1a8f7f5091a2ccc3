"""KMV (k-minimum-values) distinct sketch — approximate counting you can
differential-test.

HLL++ (Spark approx_count_distinct) and DuckDB's HLL disagree internally,
so those queries can only ever be rows-only checks. KMV is the sketch
that closes that gap: keep the k smallest values of a uniform hash of
the key; the estimate (k−1)/R_k (R_k = the k-th smallest hash mapped to
(0,1]) is a textbook mergeable estimator (Bar-Yossef et al. 2002,
"Counting distinct elements in a data stream") — and with the repo's
portable md5 base hash every sketch byte is bit-identical in any engine,
so the DuckDB oracle replays sketch construction, merging, and the
estimate itself. Deterministic approximation: wrong vs COUNT(DISTINCT)
by a bounded relative error (~1/sqrt(k−2)), identical across engines.

Scale shape: per-group sketches build in one partial-aggregated pass —
the per-partition k-smallest fold keeps only k BIGINTs per group in
flight (mergeable = the same property a production sketch library
exploits); merging sketches of shards is array-merge + re-truncate.
Estimation never touches the raw data again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators.dedup import (
    portable_hash,
    sql_portable_hash,
)

# hash domain: top 60 bits of md5 → [0, 2^60)
_DOMAIN = float(1 << 60)


def kmv_sketch(
    df: DataFrame,
    *,
    group_col: str,
    key_col: str,
    k: int = 64,
    salt: str = "kmv",
) -> DataFrame:
    """Per-group KMV sketch: the array of the ``k`` smallest distinct
    portable-hash values of ``key_col``. Returns (group, sketch).

    Shape: partial-aggregated (group, hash) dedup, then a per-group
    rank-filter so only k hashes per group ever reach the collect — the
    collected arrays are k-bounded BEFORE aggregation, not truncated
    after (a collect-then-slice would buffer every distinct hash of a
    hot group in one aggregation state)."""
    from pyspark.sql import Window

    h = portable_hash(F.col(key_col).cast("string"), salt=salt)
    pairs = df.select(
        F.col(group_col).alias("grp"), h.alias("h")
    ).dropDuplicates(["grp", "h"])
    w = Window.partitionBy("grp").orderBy("h")
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("grp")
        .agg(F.array_sort(F.collect_list("h")).alias("sketch"))
    )


def kmv_estimate(sketch: Column, *, k: int = 64) -> Column:
    """Distinct-count estimate from a sketch array: exact size when the
    group holds fewer than k distinct keys (the sketch IS the key set);
    otherwise (k−1)/R_k with R_k = kth smallest hash / 2^60."""
    n = F.size(sketch)
    kth = F.element_at(sketch, k).cast("double") / F.lit(_DOMAIN)
    return F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1)) / kth
    )


def kmv_merge(a: Column, b: Column, *, k: int = 64) -> Column:
    """Merge two sketches: union, dedup, keep the k smallest — the
    lossless combine that makes shard-parallel sketching correct."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def sql_kmv_sketch(
    *,
    table: str,
    group_expr: str,
    key_expr: str,
    k: int = 64,
    salt: str = "kmv",
) -> str:
    """DuckDB CTE body producing (grp, sketch) identical to
    :func:`kmv_sketch` (named ``kmv_sk``)."""
    h = sql_portable_hash(f"CAST({key_expr} AS VARCHAR)", salt=salt)
    return f"""kmv_sk AS (
  SELECT grp, list_sort(list(DISTINCT h))[1:{k}] AS sketch
  FROM (SELECT {group_expr} AS grp, {h} AS h FROM {table})
  GROUP BY grp
)"""


def sql_kmv_estimate(sketch: str, *, k: int = 64) -> str:
    return (
        f"CASE WHEN len({sketch}) < {k} THEN len({sketch})::DOUBLE "
        f"ELSE {float(k - 1)} / (({sketch})[{k}]::DOUBLE / {_DOMAIN}) END"
    )
