"""Similarity search over embedding columns (``array<float>``).

Two tiers, per the standard ANN architecture:
- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the full corpus, one scan, no shuffle of the corpus.
  Dot products are left-fold ``F.aggregate`` in DOUBLE so the arithmetic
  order is fixed → bit-reproducible (and mirrored by the DuckDB oracle's
  ``list_reduce``).
- **LSH-bucketed ANN (random-hyperplane signs)** — the scale path: hash
  every vector to a sign-bit bucket; probe only the query's bucket (plus
  optional multi-probe neighbors). Linear build, sub-linear probe;
  approximate by design (rows-only check).

At 100 TB the brute-force tier survives as the re-rank stage over LSH/IVF
candidates, which is exactly how it is composed here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Order-fixed left-fold dot product in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


SQL_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(range(1, len({a}) + 1), i -> ({a})[i]::DOUBLE * ({b})[i]::DOUBLE)), "
    "(acc, x) -> acc + x)"
)
SQL_NORM = "sqrt(" + SQL_DOT.format(a="{a}", b="{a}") + ")"


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector.

    queries is broadcast (it is the small side by construction); ranking is
    deterministic: (rounded score desc, neighbor id asc).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def neardup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """All pairs with cosine >= threshold (exact, quadratic — compose with
    LSH buckets below for scale)."""
    a = df.select(F.col(id_col).alias("id_a"), as_double(F.col(vec_col)).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), as_double(F.col(vec_col)).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", F.round(cosine(F.col("va"), F.col("vb")), 6))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _hyperplane(dim: int, bit: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane (fixed seed series,
    engine-independent: pure python constants baked into the plan)."""
    import math

    return [
        math.sin(0.7548776662 * (bit * dim + i) + 0.1123581321) for i in range(dim)
    ]


def lsh_bucket(vec: Column, *, dim: int, bits: int = 12) -> Column:
    """Random-hyperplane sign bucket (bits-wide int) for a vector."""
    acc = F.lit(0).cast("long")
    for b in range(bits):
        plane = F.array(*[F.lit(w) for w in _hyperplane(dim, b)])
        acc = acc + F.when(dot(vec, plane) > 0, F.lit(2**b).cast("long")).otherwise(0)
    return acc


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    dim: int = 64,
    bits: int = 12,
    multi_probe: int = 0,
) -> DataFrame:
    """Approximate top-k: exact re-rank restricted to the query's LSH
    bucket(s). Build is one linear pass; probe touches ~corpus/2^bits rows
    per probed bucket.

    ``multi_probe=1`` additionally probes every bucket at hamming distance
    1 in sign space (the standard multi-probe LSH recall lift: a near
    neighbor that disagrees on exactly one hyperplane is still found) —
    1+bits buckets per query instead of 1, still sub-linear."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    ).withColumn("bucket", lsh_bucket(F.col("cv"), dim=dim, bits=bits))
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    ).withColumn("bucket", lsh_bucket(F.col("qv"), dim=dim, bits=bits))
    if multi_probe >= 1:
        probes = F.array(
            F.col("bucket"),
            *[
                F.col("bucket").bitwiseXOR(F.lit(1 << b)).alias(f"p{b}")
                for b in range(bits)
            ],
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _nearest_centroid(
    vecs: DataFrame,
    cents: DataFrame,
    *,
    key_col: str,
    vec_alias: str,
    out: str = "cluster_id",
) -> DataFrame:
    """Assign each vector to its nearest centroid by cosine (broadcast
    centroids; deterministic tie-break on cluster id). One window shuffle
    on the unique vector id."""
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", F.round(cosine(F.col(vec_alias), F.col("cvec")), 9)
    )
    w = Window.partitionBy(key_col).orderBy(F.desc("_sim"), F.asc("_cid"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*vecs.columns, F.col("_cid").alias(out))
    )


def ivf_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Coarse quantizer for IVF: ``nlist`` centroids from a few Lloyd
    iterations, fully distributed and deterministic (seed centroids = the
    nlist lowest-id vectors; order-fixed dot products; id tie-breaks).

    Each iteration = one broadcast assignment pass + one posexplode
    groupBy mean — no vectors ever reach the driver; lineage is cut per
    iteration with localCheckpoint so the loop's plan stays bounded.
    At 10^9 vectors, train on a sampled slice and keep iters small —
    the quantizer only needs to be roughly balanced, not converged.
    """
    vecs = df.select(
        F.col(id_col).alias("_vid"), as_double(F.col(vec_col)).alias("v")
    )
    # Seed selection via TakeOrderedAndProject (per-partition top-k +
    # driver merge of nlist rows) — NOT an unpartitioned window, which
    # would funnel the whole corpus through one task.
    seeds = vecs.orderBy("_vid").limit(nlist)
    w_seed = Window.orderBy("_vid")  # over nlist rows only — trivial
    cents = (
        seeds.withColumn("_rn", F.row_number().over(w_seed))
        .select((F.col("_rn") - 1).alias("_cid"), F.col("v").alias("cvec"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = _nearest_centroid(vecs, cents, key_col="_vid", vec_alias="v")
        cents = (
            assigned.select("cluster_id", F.posexplode("v"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("col").alias("cv"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s.cv,
                ).alias("cvec")
            )
            .select(F.col("cluster_id").alias("_cid"), "cvec")
            .localCheckpoint(eager=True)
        )
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into ``nlist``
    inverted lists, probe the ``nprobe`` lists nearest to each query, and
    exact-re-rank only those lists' vectors (the standard IVF-Flat
    architecture; FAISS's CPU path, expressed as DataFrame ops).

    Probe cost ≈ corpus × nprobe / nlist per query versus full-scan
    brute force; recall is tunable with nprobe (= exact when
    nprobe = nlist). Approximate by design → rows-only driver check, with
    a planted-neighbor recall test in tests/test_llmdata.py."""
    cents = ivf_train(
        corpus, id_col=id_col, vec_col=vec_col, nlist=nlist, iters=iters
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    c_assigned = _nearest_centroid(c, cents, key_col="neighbor_id", vec_alias="cv")
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    q_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", F.round(cosine(F.col("qv"), F.col("cvec")), 9)
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("_cid"))
    q_probes = (
        q_scored.withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", F.col("_cid").alias("cluster_id"))
    )
    scored = (
        c_assigned.join(F.broadcast(q_probes), "cluster_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def centroids(
    df: DataFrame, *, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroid, exploded to (label, pos, avg) — the distributed
    formulation (posexplode + groupBy) that never materializes a vector on
    the driver."""
    return (
        df.select(F.col(label_col), F.posexplode(as_double(F.col(vec_col))))
        .groupBy(label_col, "pos")
        .agg(F.round(F.avg("col"), 6).alias("centroid_val"))
    )
