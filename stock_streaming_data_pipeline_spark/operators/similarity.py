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

import pandas as pd  # noqa: F401  (resolves pandas_udf type hints)
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


def sql_lsh_topk(
    *,
    table: str = "embeddings",
    query_pred: str = "vec_id < 10",
    k: int = 5,
    dim: int = 64,
    bits: int = 4,
) -> str:
    """DuckDB mirror of single-probe :func:`lsh_topk`: the hyperplane
    weights are the SAME Python-generated double literals the Spark plan
    embeds via ``F.lit`` (no trig evaluated in either engine), and both
    sides use the identical left-fold dot product — bucket assignment and
    re-rank scores reproduce bit-for-bit, giving the 'approximate' ANN
    path a hash-exact differential oracle."""

    def plane_lit(b: int) -> str:
        return "[" + ", ".join(repr(w) for w in _hyperplane(dim, b)) + "]"

    def bucket_expr(col: str) -> str:
        terms = [
            f"(CASE WHEN ({SQL_DOT.format(a=col, b=plane_lit(b))}) > 0 "
            f"THEN {2 ** b} ELSE 0 END)"
            for b in range(bits)
        ]
        return "(" + " + ".join(terms) + ")"

    cos = (
        f"round(({SQL_DOT.format(a='c.embedding', b='q.qv')}) / "
        f"(({SQL_NORM.format(a='c.embedding')}) * ({SQL_NORM.format(a='q.qv')})), 6)"
    )
    return f"""
WITH c AS (
  SELECT vec_id, embedding, {bucket_expr('embedding')} AS bucket
  FROM {table}
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket
  FROM c WHERE {query_pred}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, {cos} AS cosine
  FROM c JOIN q USING (bucket)
  WHERE c.vec_id != q.query_id
)
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


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
    on the unique vector id. The similarity is rounded to 6 decimals
    BEFORE the argmin so the decision is insensitive to last-ulp noise in
    the centroid means (double aggregation order differs across engines
    and across partition layouts); ties resolve by cluster id — the same
    rule the DuckDB kmeans oracle replays."""
    scored = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", F.round(cosine(F.col(vec_alias), F.col("cvec")), 6)
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
    Clusters that go empty during an update RETAIN their previous
    centroid (left-join + coalesce), so the trainer always returns
    exactly ``nlist`` centroids regardless of the data distribution.
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
        new_means = (
            assigned.select("cluster_id", F.posexplode("v"))
            .groupBy("cluster_id", "pos")
            .agg(F.avg("col").alias("cv"))
            .groupBy("cluster_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s.cv,
                ).alias("new_cvec")
            )
            .select(F.col("cluster_id").alias("_cid"), "new_cvec")
        )
        # A cluster that captured no vectors this round keeps its previous
        # centroid (left-join + coalesce) instead of silently vanishing —
        # the update step must always return exactly nlist centroids.
        cents = (
            cents.select("_cid", F.col("cvec").alias("old_cvec"))
            .join(new_means, "_cid", "left")
            .select(
                "_cid", F.coalesce("new_cvec", "old_cvec").alias("cvec")
            )
            .localCheckpoint(eager=True)
        )
    return cents


SQL_L2SQ = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(range(1, len({a}) + 1), "
    "i -> (({a})[i]::DOUBLE - ({b})[i]::DOUBLE) * "
    "(({a})[i]::DOUBLE - ({b})[i]::DOUBLE))), (acc, x) -> acc + x)"
)


def _sql_cos(a: str, b: str, digits: int | None) -> str:
    raw = (
        f"({SQL_DOT.format(a=a, b=b)}) / "
        f"(({SQL_NORM.format(a=a)}) * ({SQL_NORM.format(a=b)}))"
    )
    return raw if digits is None else f"round({raw}, {digits})"


def _sql_lloyd_ctes(table: str, k: int, iters: int) -> list[str]:
    """Chained CTEs for the seeded Lloyd loop (the :func:`ivf_train`
    semantics in SQL): seeds = k lowest ids, round-6 cosine argmin with
    id tie-breaks, per-position double means, empty-cluster retention.
    Final centroids land in CTE ``c{iters}``."""
    parts = [
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
         list_transform(embedding, x -> x::DOUBLE) AS cvec
  FROM (SELECT vec_id, embedding FROM {table} ORDER BY vec_id LIMIT {k})
)"""
    ]
    for i in range(iters):
        parts.append(
            f"""a{i} AS (
  SELECT vec_id, cid,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY sim DESC, cid
         ) AS rn
  FROM (
    SELECT e.vec_id, c.cid, {_sql_cos('e.embedding', 'c.cvec', 6)} AS sim
    FROM {table} e CROSS JOIN c{i} c
  )
)""")
        parts.append(
            f"""m{i} AS (
  SELECT g.cid, u.i AS pos, avg((e.embedding)[u.i]::DOUBLE) AS mv
  FROM (SELECT vec_id, cid FROM a{i} WHERE rn = 1) g
  JOIN {table} e USING (vec_id),
       unnest(range(1, len(e.embedding) + 1)) AS u(i)
  GROUP BY g.cid, u.i
)""")
        parts.append(
            f"""c{i + 1} AS (
  SELECT c.cid, coalesce(n.new_cvec, c.cvec) AS cvec
  FROM c{i} c LEFT JOIN (
    SELECT cid, list(mv ORDER BY pos) AS new_cvec FROM m{i} GROUP BY cid
  ) n USING (cid)
)""")
    return parts


def sql_kmeans_profile(
    *, table: str = "embeddings", k: int = 8, iters: int = 4
) -> str:
    """DuckDB mirror of :func:`kmeans_profile`: the seeded Lloyd loop
    unrolled into chained CTEs, then the per-cluster profile. Both
    engines make identical assignment decisions (the round-6 argmin
    absorbs double-sum ordering noise in the means), turning the
    'iterative, not SQL-expressible' query into a full differential
    check."""
    parts = _sql_lloyd_ctes(table, k, iters)
    parts.append(
        f"""fin AS (
  SELECT vec_id, cid, cvec,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY sim DESC, cid
         ) AS rn
  FROM (
    SELECT e.vec_id, c.cid, c.cvec,
           {_sql_cos('e.embedding', 'c.cvec', 6)} AS sim
    FROM {table} e CROSS JOIN c{iters} c
  )
)"""
    )
    body = ",\n".join(parts)
    l2 = SQL_L2SQ.format(a="e.embedding", b="f.cvec")
    cos_raw = _sql_cos("e.embedding", "f.cvec", None)
    return f"""
WITH {body}
SELECT f.cid AS cluster_id, count(*) AS size,
       round(sum({l2}), 4) AS inertia,
       round(avg({cos_raw}), 6) AS avg_cosine
FROM (SELECT vec_id, cid, cvec FROM fin WHERE rn = 1) f
JOIN {table} e USING (vec_id)
GROUP BY f.cid
ORDER BY f.cid
"""


def sql_ivf_topk(
    *,
    table: str = "embeddings",
    query_pred: str = "vec_id < 10",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 3,
    iters: int = 2,
) -> str:
    """DuckDB mirror of :func:`ivf_topk`: replays the Lloyd-trained
    coarse quantizer (shared CTE builder), corpus list assignment, the
    nprobe nearest-list selection per query, and the exact re-rank inside
    the probed lists — the full IVF-Flat pipeline as one differential
    check (approximate vs brute force by design, deterministic in
    execution)."""
    parts = _sql_lloyd_ctes(table, k=nlist, iters=iters)
    parts.append(
        f"""asg AS (
  SELECT vec_id, cid
  FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_cos('e.embedding', 'c.cvec', 6)} DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN c{iters} c
  ) WHERE rn = 1
)"""
    )
    parts.append(
        f"""probes AS (
  SELECT query_id, cid
  FROM (
    SELECT e.vec_id AS query_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY {_sql_cos('e.embedding', 'c.cvec', 6)} DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN c{iters} c
    WHERE {query_pred}
  ) WHERE rn <= {nprobe}
)"""
    )
    cos = _sql_cos("n.embedding", "q.embedding", 6)
    parts.append(
        f"""scored AS (
  SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id, {cos} AS cosine
  FROM probes p
  JOIN {table} q ON q.vec_id = p.query_id
  JOIN asg a ON a.cid = p.cid
  JOIN {table} n ON n.vec_id = a.vec_id
  WHERE n.vec_id != q.vec_id
)"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def _round6_spark(x: float) -> float:
    """Spark F.round(double, 6): BigDecimal.valueOf semantics — HALF_UP
    on the SHORTEST DECIMAL REPR of the double (repr(x) in Python), the
    documented cross-engine recipe pinned by the rounding tests."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP))


def sql_ivf_topk_expected(
    sf_dir: str,
    *,
    table: str = "embeddings",
    query_pred: str = "vec_id < 10",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 3,
    iters: int = 2,
) -> str:
    """Literal-VALUES oracle for :func:`ivf_topk` — the bounded-memory
    replacement for :func:`sql_ivf_topk` at large scale factors (the
    unrolled Lloyd CTEs re-derive corpus×centroid cross products per
    iteration and made DuckDB disk-bound at sf1). Replays the exact
    operator arithmetic in numpy/Python: float32→float64 embedding cast
    (exact), ordered LEFT-FOLD dot products (np.cumsum accumulates
    sequentially along the dim axis — the same add order as Spark's
    F.aggregate fold and DuckDB's list_reduce), IEEE sqrt/divide, Spark
    round-6 (:func:`_round6_spark`) before every argmin/rank decision
    with cid/neighbor-id tie-breaks, per-cluster means summed in vec_id
    order (order differences are absorbed by the round-6 decisions, the
    same robustness contract the SQL oracle relied on), empty-cluster
    retention. Memory is O(corpus × dim); the OPQ/xxh64 literal-oracle
    precedent."""
    import duckdb
    import numpy as np

    from stock_streaming_data_pipeline_spark.tables import duck_glob

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{duck_glob(sf_dir, table)}')"
    )
    rows = con.execute(
        f"SELECT vec_id, embedding FROM {table} ORDER BY vec_id"
    ).fetchall()
    qids = [
        r[0]
        for r in con.execute(
            f"SELECT vec_id FROM {table} WHERE {query_pred} ORDER BY vec_id"
        ).fetchall()
    ]
    con.close()

    ids = np.array([r[0] for r in rows], dtype=np.int64)
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    norms = np.sqrt(np.cumsum(vecs * vecs, axis=1)[:, -1])

    def cos6_vs_centroid(c: np.ndarray) -> np.ndarray:
        """round6(cosine(v, c)) for every corpus vector — ordered fold."""
        dots = np.cumsum(vecs * c[None, :], axis=1)[:, -1]
        cnorm = float(np.sqrt(np.cumsum(c * c)[-1]))
        sims = dots / (norms * cnorm)
        return np.array([_round6_spark(float(s)) for s in sims])

    def rank_centroids(cents: list[np.ndarray]) -> np.ndarray:
        """(N, nlist) round-6 sims, one column per cid."""
        return np.stack([cos6_vs_centroid(c) for c in cents], axis=1)

    # Seeds: the nlist lowest-id vectors, cid assigned in vec_id order.
    cents = [vecs[i].copy() for i in range(nlist)]
    for _ in range(iters):
        sims = rank_centroids(cents)
        # argmax by (sim desc, cid asc): np.argmax returns the FIRST
        # maximal index — exactly the lowest-cid tie-break.
        assign = np.argmax(sims, axis=1)
        for cid in range(nlist):
            mask = assign == cid
            if not mask.any():
                continue  # empty cluster retains its previous centroid
            sub = vecs[mask]  # already in ascending vec_id order
            cents[cid] = np.cumsum(sub, axis=0)[-1, :] / float(sub.shape[0])
    sims = rank_centroids(cents)
    assign = np.argmax(sims, axis=1)

    id_to_ix = {int(v): i for i, v in enumerate(ids)}
    out: list[tuple[int, int, float, int]] = []
    for qid in qids:
        qx = id_to_ix[int(qid)]
        qsims = sims[qx]
        probe_order = sorted(range(nlist), key=lambda c: (-qsims[c], c))
        probed = set(probe_order[:nprobe])
        cand_ix = [
            i
            for i in range(len(ids))
            if int(assign[i]) in probed and int(ids[i]) != int(qid)
        ]
        qv = vecs[qx]
        qn = float(norms[qx])
        scored = []
        for i in cand_ix:
            d = float(np.cumsum(qv * vecs[i])[-1])
            scored.append(
                (_round6_spark(d / (qn * float(norms[i]))), int(ids[i]))
            )
        scored.sort(key=lambda t: (-t[0], t[1]))
        for rank, (c6, nid) in enumerate(scored[:k], start=1):
            out.append((int(qid), nid, c6, rank))

    if not out:
        return (
            "SELECT CAST(NULL AS BIGINT) AS query_id, "
            "CAST(NULL AS BIGINT) AS neighbor_id, "
            "CAST(NULL AS DOUBLE) AS cosine, "
            "CAST(NULL AS BIGINT) AS rank WHERE 1 = 0"
        )
    values = ",\n".join(f"({q}, {n}, {c!r}, {r})" for q, n, c, r in out)
    return (
        "SELECT CAST(query_id AS BIGINT) AS query_id, "
        "CAST(neighbor_id AS BIGINT) AS neighbor_id, "
        "CAST(cosine AS DOUBLE) AS cosine, CAST(rank AS BIGINT) AS rank\n"
        f"FROM (VALUES\n{values}\n) AS t(query_id, neighbor_id, cosine, rank)"
    )


def kmeans_profile(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 4,
) -> DataFrame:
    """Distributed Lloyd k-means (the :func:`ivf_train` loop) surfaced as
    a clustering operator: train ``k`` centroids with ``iters`` iterations,
    assign every vector, and return per-cluster profiles
    ``(cluster_id, size, inertia, avg_cosine)``.

    Everything stays distributed: per iteration one broadcast assignment
    pass over the corpus plus one posexplode mean — vectors never reach
    the driver, so the same plan runs at 10^9 vectors (train on a sample
    there; the profile pass is a single scan either way)."""
    cents = ivf_train(df, id_col=id_col, vec_col=vec_col, nlist=k, iters=iters)
    vecs = df.select(
        F.col(id_col).alias("_vid"), as_double(F.col(vec_col)).alias("v")
    )
    assigned = _nearest_centroid(vecs, cents, key_col="_vid", vec_alias="v")
    j = assigned.join(
        F.broadcast(cents), assigned["cluster_id"] == cents["_cid"]
    )
    return (
        j.groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("size"),
            F.round(F.sum(l2sq(F.col("v"), F.col("cvec"))), 4).alias("inertia"),
            F.round(F.avg(cosine(F.col("v"), F.col("cvec"))), 6).alias("avg_cosine"),
        )
        .orderBy("cluster_id")
    )


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
    # round-6 before the probe argsort (same ulp-robustness rule as
    # _nearest_centroid; mirrored by the SQL oracles).
    q_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", F.round(cosine(F.col("qv"), F.col("cvec")), 6)
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


def sql_ivf_pq_topk(
    *,
    table: str = "embeddings",
    query_pred: str = "vec_id < 10",
    k: int = 5,
    nlist: int = 8,
    nprobe: int = 3,
    num_sub: int = 8,
    ksub: int = 16,
    rerank: int = 32,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """DuckDB mirror of :func:`ivf_pq_topk` — the ENTIRE IVF-PQ pipeline
    replayed: coarse Lloyd training (shared CTE builder), residual
    computation, per-subspace codebook training with empty-code
    retention, code assignment (round-6 squared-L2 argmin, code
    tie-break via struct min — the same lexicographic struct comparison
    Spark's ``F.min(struct(d, code))`` performs), ADC LUT scoring,
    shortlist selection and the exact re-rank. Every ranking decision is
    made on round-6 values, so last-ulp noise in double-aggregated
    means/residuals cannot flip a decision in one engine only."""
    dsub = dim // num_sub
    cos6 = _sql_cos("e.embedding", "c.cvec", 6)
    parts = _sql_lloyd_ctes(table, k=nlist, iters=iters)
    parts.append(
        f"""asg AS MATERIALIZED (
  SELECT vec_id, cid, cvec
  FROM (
    SELECT e.vec_id, c.cid, c.cvec,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {cos6} DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN c{iters} c
  ) WHERE rn = 1
)"""
    )
    parts.append(
        f"""res AS MATERIALIZED (
  SELECT a.vec_id, a.cid,
         list_transform(range(1, {dim} + 1),
                        i -> (e.embedding)[i]::DOUBLE - (a.cvec)[i]) AS rv
  FROM asg a JOIN {table} e USING (vec_id)
)"""
    )
    parts.append(
        f"""sub AS MATERIALIZED (
  SELECT vec_id, CAST(u.m AS INT) AS m,
         list_transform(range(u.m * {dsub} + 1, u.m * {dsub} + {dsub} + 1),
                        i -> rv[i]) AS sub
  FROM res, unnest(range(0, {num_sub})) AS u(m)
)"""
    )
    parts.append(
        f"""cb0 AS MATERIALIZED (
  SELECT m, CAST(rn - 1 AS INT) AS code, sub AS cbvec
  FROM (
    SELECT m, sub,
           row_number() OVER (PARTITION BY m ORDER BY vec_id) AS rn
    FROM sub
  ) WHERE rn <= {ksub}
)"""
    )
    l2_sub_cb = SQL_L2SQ.format(a="s.sub", b="cb.cbvec")
    for r in range(iters + 1):  # iters training rounds + final encode
        parts.append(
            f"""as{r} AS MATERIALIZED (
  SELECT vec_id, m,
         (min(struct_pack(d := d6, code := code))).code AS code
  FROM (
    SELECT s.vec_id, s.m, cb.code,
           round({l2_sub_cb}, 6) AS d6
    FROM sub s JOIN cb{r} cb USING (m)
  ) GROUP BY vec_id, m
)"""
        )
        if r == iters:
            break
        parts.append(
            f"""cb{r + 1} AS MATERIALIZED (
  SELECT cb.m, cb.code, coalesce(n.new_cbvec, cb.cbvec) AS cbvec
  FROM cb{r} cb LEFT JOIN (
    SELECT m, code, list(cv ORDER BY pos) AS new_cbvec
    FROM (
      SELECT a.m, a.code, u.i AS pos, avg((s.sub)[u.i]) AS cv
      FROM as{r} a
      JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
           unnest(range(1, {dsub} + 1)) AS u(i)
      GROUP BY a.m, a.code, u.i
    ) GROUP BY m, code
  ) n ON n.m = cb.m AND n.code = cb.code
)"""
        )
    parts.append(
        f"""codes AS MATERIALIZED (
  SELECT a.vec_id AS neighbor_id, r.cid AS cluster_id, a.m, a.code
  FROM as{iters} a JOIN res r ON r.vec_id = a.vec_id
)"""
    )
    parts.append(
        f"""probes AS MATERIALIZED (
  SELECT query_id, cid, cvec
  FROM (
    SELECT e.vec_id AS query_id, c.cid, c.cvec,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {cos6} DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN c{iters} c
    WHERE {query_pred}
  ) WHERE rn <= {nprobe}
)"""
    )
    parts.append(
        f"""qsub AS MATERIALIZED (
  SELECT p.query_id, p.cid, CAST(u.m AS INT) AS m,
         list_transform(range(u.m * {dsub} + 1, u.m * {dsub} + {dsub} + 1),
                        i -> (e.embedding)[i]::DOUBLE - (p.cvec)[i]) AS qs
  FROM probes p JOIN {table} e ON e.vec_id = p.query_id,
       unnest(range(0, {num_sub})) AS u(m)
)"""
    )
    l2_q_cb = SQL_L2SQ.format(a="q.qs", b="cb.cbvec")
    parts.append(
        f"""lut AS MATERIALIZED (
  SELECT q.query_id, q.cid AS cluster_id, q.m, cb.code,
         round({l2_q_cb}, 6) AS pdist
  FROM qsub q JOIN cb{iters} cb USING (m)
)"""
    )
    parts.append(
        f"""adc AS MATERIALIZED (
  SELECT l.query_id, c.neighbor_id, round(sum(l.pdist), 6) AS adc_dist
  FROM codes c
  JOIN lut l ON l.cluster_id = c.cluster_id AND l.m = c.m AND l.code = c.code
  WHERE c.neighbor_id != l.query_id
  GROUP BY 1, 2
)"""
    )
    parts.append(
        f"""short AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC
           ) AS rn
    FROM adc
  ) WHERE rn <= {rerank}
)"""
    )
    cos_final = _sql_cos("n.embedding", "q.embedding", 6)
    parts.append(
        f"""scored AS (
  SELECT s.query_id, s.neighbor_id, {cos_final} AS cosine
  FROM short s
  JOIN {table} n ON n.vec_id = s.neighbor_id
  JOIN {table} q ON q.vec_id = s.query_id
)"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def l2sq(a: Column, b: Column) -> Column:
    """Order-fixed left-fold squared L2 distance in double."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sub_rows(
    df: DataFrame, *, key_col: str, vec_alias: str, num_sub: int, dsub: int
) -> DataFrame:
    """Explode a vector column into ``num_sub`` subspace rows
    ``(key, m, sub)`` where ``sub`` is the m-th length-``dsub`` slice.
    Native slice expressions — one generate pass, no lambdas in the
    per-subvector hot path."""
    pieces = F.array(
        *[
            F.struct(
                F.lit(m).alias("m"),
                F.slice(F.col(vec_alias), m * dsub + 1, dsub).alias("sub"),
            )
            for m in range(num_sub)
        ]
    )
    return df.select(key_col, F.explode(pieces).alias("_p")).select(
        key_col, F.col("_p.m").alias("m"), F.col("_p.sub").alias("sub")
    )


def _argmin_code(
    rows: DataFrame, codebook: DataFrame, *, key_col: str, carry_sub: bool = False
) -> DataFrame:
    """Assign each ``(key, m, sub)`` row the code of its nearest codebook
    entry (squared L2; deterministic tie-break on code asc). The codebook
    is broadcast; argmin is a ``min_by``-style partial-aggregated groupBy —
    one shuffle keyed by (key, m), never a window over the joined rows.

    With ``carry_sub=True`` the output additionally carries the row's own
    subvector — every row of a (key, m) group holds the IDENTICAL ``sub``
    bytes (the group is one input row fanned out over the broadcast
    codebook), so riding it through the min-struct is deterministic: the
    (d, code) prefix is unique per group and decides the min before
    ``sub`` is ever compared. Callers that need ``sub`` next to the
    assignment (Lloyd mean updates) then skip a corpus-scale join back
    to ``rows`` (optimization round 11; guide §2.4)."""
    # round-6 before the argmin (the _nearest_centroid ulp-robustness
    # rule: codebook means are double aggregates whose summation order
    # differs across engines/partitionings; ties resolve on code asc —
    # mirrored by the SQL oracle).
    fields = [
        F.round(l2sq(F.col("sub"), F.col("cbvec")), 6).alias("d"),
        F.col("code").alias("code"),
    ]
    if carry_sub:
        fields.append(F.col("sub").alias("sub"))
    scored = rows.join(F.broadcast(codebook), "m").select(
        key_col, "m", F.struct(*fields).alias("dc")
    )
    out_cols = [key_col, "m", F.col("best.code").alias("code")]
    if carry_sub:
        out_cols.append(F.col("best.sub").alias("sub"))
    return (
        scored.groupBy(key_col, "m")
        .agg(F.min("dc").alias("best"))
        .select(*out_cols)
    )


def pq_train(
    sub_rows: DataFrame,
    *,
    key_col: str,
    num_sub: int,
    ksub: int = 16,
    iters: int = 2,
    complete_keys: bool = False,
) -> DataFrame:
    """Per-subspace product-quantization codebooks: ``ksub`` centroids per
    subspace from a few Lloyd iterations over ``(key, m, sub)`` rows —
    all ``num_sub`` subspaces train concurrently in the same distributed
    passes (grouping carries ``m``), so training cost does not scale with
    the number of subspaces.

    Deterministic: seeds are the ``ksub`` lowest-key subvectors per
    subspace; assignment tie-breaks on code; lineage cut per iteration.
    At 10^9 vectors train on a sampled slice — the codebook only needs
    coverage, not convergence (same contract as :func:`ivf_train`).
    Returns ``(m, code, cbvec)``.
    """
    # Seed selection (optimization round 11): when every key contributes
    # a row to EVERY subspace (complete_keys=True — the _sub_rows
    # callers: pq/opq/ivf-pq), the ksub*num_sub lowest rows under the
    # total (key, m) order are exactly the ksub lowest-key subvectors of
    # every subspace, so the seeds come from a TakeOrderedAndProject
    # (the ivf_train pattern) and the rank window runs over ksub*num_sub
    # rows only. The previous formulation — kept for callers whose keys
    # appear under a SINGLE m (ivf2's per-cell reuse, where "m" is the
    # level-1 cell id) — sorted the entire subvector relation through
    # num_sub window tasks just to keep ksub rows each.
    w_seed = Window.partitionBy("m").orderBy(F.asc(key_col))
    seeds = (
        sub_rows.orderBy(F.asc(key_col), F.asc("m")).limit(ksub * num_sub)
        if complete_keys
        else sub_rows
    )
    codebook = (
        seeds.withColumn("_rn", F.row_number().over(w_seed))
        .filter(F.col("_rn") <= ksub)
        .select("m", (F.col("_rn") - 1).alias("code"), F.col("sub").alias("cbvec"))
    )
    if not complete_keys:
        # The full-window seed path sorts the entire subvector relation —
        # checkpoint so iteration 1 doesn't run it twice (argmin broadcast
        # + retention join). The complete-keys TakeOrdered seed is a
        # ksub*num_sub-row top-k over the caller's already-materialized
        # relation: re-executing it twice is cheaper than an eager
        # checkpoint job (A/B round 12: 1.53 → 1.34 s per pq_train,
        # bit-identical codebooks).
        codebook = codebook.localCheckpoint(eager=True)
    for _ in range(iters):
        # carry_sub rides each row's subvector through the argmin struct,
        # so the mean update needs no corpus-scale join back to sub_rows
        # (one shuffle per Lloyd iteration instead of three).
        coded = _argmin_code(sub_rows, codebook, key_col=key_col, carry_sub=True)
        new_means = (
            coded.select("m", "code", F.posexplode("sub"))
            .groupBy("m", "code", "pos")
            .agg(F.avg("col").alias("cv"))
            .groupBy("m", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "cv"))),
                    lambda s: s.cv,
                ).alias("new_cbvec")
            )
        )
        # codes that captured no subvectors retain their previous entry —
        # the update always returns exactly num_sub x ksub codebook rows
        # (same retention rule as ivf_train).
        codebook = (
            codebook.select("m", "code", F.col("cbvec").alias("old_cbvec"))
            .join(new_means, ["m", "code"], "left")
            .select(
                "m", "code", F.coalesce("new_cbvec", "old_cbvec").alias("cbvec")
            )
            .localCheckpoint(eager=True)
        )
    return codebook


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    num_sub: int = 8,
    ksub: int = 16,
    rerank: int = 32,
    iters: int = 2,
) -> DataFrame:
    """IVF-PQ approximate top-k — the compression tier for 10^9-vector
    corpora (FAISS ``IVFx,PQy`` architecture as DataFrame ops):

    1. coarse-quantize the corpus into ``nlist`` inverted lists
       (:func:`ivf_train`), and encode each vector's RESIDUAL against its
       coarse centroid as ``num_sub`` codes of ``log2(ksub)`` bits via
       per-subspace codebooks (:func:`pq_train`) — the stored
       representation shrinks from ``dim`` floats to ``num_sub`` bytes
       (64x here), which is what lets an exabyte-scale index fit on disk;
    2. per query, probe the ``nprobe`` nearest lists and score candidates
       with asymmetric distance (ADC): a per-(query, list) lookup table of
       subspace distances, summed over each candidate's codes — candidates
       never need their full vectors;
    3. exact-cosine re-rank of the ``rerank`` best ADC candidates only.

    The ADC join carries only ``(candidate, m, code)`` rows against a
    broadcast LUT of ``queries x nprobe x num_sub x ksub`` entries; the
    full-vector join happens for ``rerank`` rows per query only.
    Approximate by design -> rows-only driver check, with planted-neighbor
    and recall tests in tests/test_llmdata.py.
    """
    dim_row = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    dim = int(dim_row["d"])
    assert dim % num_sub == 0, "num_sub must divide the embedding dim"
    dsub = dim // num_sub

    cents = ivf_train(corpus, id_col=id_col, vec_col=vec_col, nlist=nlist, iters=iters)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    c_assigned = _nearest_centroid(c, cents, key_col="neighbor_id", vec_alias="cv")
    # Residual against the assigned coarse centroid, exploded to subspaces.
    c_res = (
        c_assigned.join(
            F.broadcast(cents.withColumnsRenamed({"_cid": "cluster_id"})), "cluster_id"
        )
        .select(
            "neighbor_id",
            "cluster_id",
            F.zip_with("cv", "cvec", lambda x, y: x - y).alias("rv"),
        )
        # Eager localCheckpoint, not persist (round 12 hygiene): feeds
        # codebook training AND encoding; the builder cannot unpersist
        # (the encoding consumer is lazy), and a checkpoint RDD releases
        # with the frame's GC instead of living in the CacheManager.
        .localCheckpoint(eager=True)
    )
    c_sub = _sub_rows(
        c_res.select("neighbor_id", F.col("rv").alias("v")),
        key_col="neighbor_id",
        vec_alias="v",
        num_sub=num_sub,
        dsub=dsub,
    )
    codebook = pq_train(
        c_sub, key_col="neighbor_id", num_sub=num_sub, ksub=ksub, iters=iters,
        complete_keys=True,
    )
    codes = _argmin_code(c_sub, codebook, key_col="neighbor_id").join(
        c_res.select("neighbor_id", "cluster_id"), "neighbor_id"
    )

    # Query side: probe lists, then build the per-(query, list) ADC LUT.
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    # round-6 before the probe argsort (same ulp-robustness rule as
    # _nearest_centroid; mirrored by the SQL oracles).
    q_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", F.round(cosine(F.col("qv"), F.col("cvec")), 6)
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("_cid"))
    q_probes = (
        q_scored.withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select(
            "query_id",
            "qv",
            F.col("_cid").alias("cluster_id"),
            F.zip_with("qv", "cvec", lambda x, y: x - y).alias("qr"),
        )
    )
    q_sub = _sub_rows(
        q_probes.select(
            F.concat_ws("#", "query_id", "cluster_id").alias("qc"), F.col("qr").alias("v")
        ),
        key_col="qc",
        vec_alias="v",
        num_sub=num_sub,
        dsub=dsub,
    )
    lut = (
        q_sub.join(F.broadcast(codebook), "m")
        .select(
            F.split_part(F.col("qc"), F.lit("#"), F.lit(1)).cast("long").alias("query_id"),
            F.split_part(F.col("qc"), F.lit("#"), F.lit(2)).cast("long").alias("cluster_id"),
            "m",
            "code",
            F.round(l2sq(F.col("sub"), F.col("cbvec")), 6).alias("pdist"),
        )
    )
    # ADC: sum the LUT distances over each candidate's codes.
    adc = (
        codes.join(F.broadcast(lut), ["cluster_id", "m", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("pdist"), 6).alias("adc_dist"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("neighbor_id"))
    shortlist = (
        adc.withColumn("_rn", F.row_number().over(w_adc))
        .filter(F.col("_rn") <= rerank)
        .select("query_id", "neighbor_id")
    )
    # Exact re-rank on the shortlist only.
    rescored = (
        shortlist.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf2_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nlist1: int = 4,
    nlist2: int = 4,
    nprobe1: int = 2,
    nprobe2: int = 2,
    iters: int = 2,
) -> DataFrame:
    """Hierarchical (two-level) IVF top-k: a coarse quantizer over the
    corpus (nlist1 cells, cosine Lloyd), then a per-cell sub-quantizer
    (nlist2 sub-cells each, squared-L2 Lloyd) — probes descend the tree
    (nprobe1 cells -> nprobe2 sub-cells inside each) and only the
    reached leaves are exact-cosine re-ranked. This is the index shape
    that keeps probe cost flat as nlist must grow with the corpus
    (sqrt-scaling lists at 10^9+ vectors get individually too big to
    train/balance flat; two levels give nlist1*nlist2 leaves for
    nlist1+nlist2 training cost).

    Implementation reuse: the per-cell sub-quantizer IS :func:`pq_train`
    with the level-1 cell id as the grouping column and the full vector
    as the "subvector" — same seeded Lloyd, same round-6 argmin and
    tie-breaks, so the DuckDB oracle replays it with the shared CTE
    chain (:func:`_sql_pq_chain` with ``sub_sql``)."""
    cents1 = ivf_train(
        corpus, id_col=id_col, vec_col=vec_col, nlist=nlist1, iters=iters
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    a1 = _nearest_centroid(c, cents1, key_col="neighbor_id", vec_alias="cv")
    rows = a1.select(
        "neighbor_id", F.col("cluster_id").alias("m"), F.col("cv").alias("sub")
    )
    cb2 = pq_train(
        rows, key_col="neighbor_id", num_sub=nlist1, ksub=nlist2, iters=iters
    )
    codes = _argmin_code(rows, cb2, key_col="neighbor_id")

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    q1 = q.crossJoin(F.broadcast(cents1)).withColumn(
        "_sim", F.round(cosine(F.col("qv"), F.col("cvec")), 6)
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("_cid"))
    probes1 = (
        q1.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= nprobe1)
        .select("query_id", "qv", F.col("_cid").alias("m"))
    )
    q2 = probes1.join(F.broadcast(cb2), "m").withColumn(
        "_d", F.round(l2sq(F.col("qv"), F.col("cbvec")), 6)
    )
    w2 = Window.partitionBy("query_id", "m").orderBy(F.asc("_d"), F.asc("code"))
    probes2 = (
        q2.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= nprobe2)
        .select("query_id", "m", "code")
    )
    cands = (
        codes.join(F.broadcast(probes2), ["m", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
    )
    rescored = (
        cands.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def sql_ivf2_topk(
    *,
    table: str = "embeddings",
    query_pred: str = "vec_id < 10",
    k: int = 5,
    nlist1: int = 4,
    nlist2: int = 4,
    nprobe1: int = 2,
    nprobe2: int = 2,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """DuckDB mirror of :func:`ivf2_topk`: level-1 Lloyd replay (shared
    CTE builder), level-2 per-cell Lloyd via the shared pq_train chain
    (grouping = cell id, subvector = full vector), tree-descent probes,
    exact re-rank."""
    cos6 = _sql_cos("e.embedding", "c.cvec", 6)
    parts = _sql_lloyd_ctes(table, k=nlist1, iters=iters)
    parts.append(
        f"""asg AS MATERIALIZED (
  SELECT vec_id, cid
  FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {cos6} DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN c{iters} c
  ) WHERE rn = 1
)"""
    )
    parts.append(
        f"""cvx AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v
  FROM {table}
)"""
    )
    sub_sql = """
  SELECT a.vec_id, CAST(a.cid AS INT) AS m, c.v AS sub
  FROM asg a JOIN cvx c USING (vec_id)"""
    parts += _sql_pq_chain(
        num_sub=nlist1, dsub=dim, ksub=nlist2, pq_iters=iters, sub_sql=sub_sql
    )
    parts.append(
        f"""probes1 AS MATERIALIZED (
  SELECT query_id, cid AS m
  FROM (
    SELECT e.vec_id AS query_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {cos6} DESC, c.cid
           ) AS rn
    FROM {table} e CROSS JOIN c{iters} c
    WHERE {query_pred}
  ) WHERE rn <= {nprobe1}
)"""
    )
    l2_q_cb = SQL_L2SQ.format(a="qv.v", b="cb.cbvec")
    parts.append(
        f"""probes2 AS MATERIALIZED (
  SELECT query_id, m, code
  FROM (
    SELECT p.query_id, p.m, cb.code,
           row_number() OVER (
             PARTITION BY p.query_id, p.m
             ORDER BY round({l2_q_cb}, 6) ASC, cb.code ASC
           ) AS rn
    FROM probes1 p
    JOIN cvx qv ON qv.vec_id = p.query_id
    JOIN cb{iters} cb ON cb.m = p.m
  ) WHERE rn <= {nprobe2}
)"""
    )
    cos_final = _sql_cos("n.embedding", "q.embedding", 6)
    parts.append(
        f"""scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {cos_final} AS cosine
  FROM as{iters} a
  JOIN probes2 p ON p.m = a.m AND p.code = a.code
  JOIN {table} n ON n.vec_id = a.vec_id
  JOIN {table} q ON q.vec_id = p.query_id
  WHERE a.vec_id != p.query_id
)"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""


def _rotate_vecs(df: DataFrame, R, *, id_col: str, vec_col: str, out: str = "v") -> DataFrame:
    """Apply a d×d rotation to every vector via an Arrow-batched pandas
    UDF (one numpy matmul per batch). Built-ins would need d interpreted
    lambda folds per row — the codegen anti-pattern SCALE.md documents —
    so this is the legitimate vectorized-UDF case. R rides the closure
    (d² doubles, KBs)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    Rt = np.ascontiguousarray(R.T)

    @pandas_udf("array<double>")
    def rot(col: pd.Series) -> pd.Series:
        M = np.vstack(col.to_numpy())
        return pd.Series(list(M @ Rt))

    return df.select(F.col(id_col), rot(as_double(F.col(vec_col))).alias(out))


def _pq_reconstruct(sub_rows: DataFrame, codebook: DataFrame, *, key_col: str) -> DataFrame:
    """Decode each vector from its nearest-code assignment: codes joined
    back to the broadcast codebook, subvectors reassembled in subspace
    order. Returns ``(key, vhat)``."""
    coded = _argmin_code(sub_rows, codebook, key_col=key_col)
    return (
        coded.join(F.broadcast(codebook), ["m", "code"])
        .groupBy(key_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("m", "cbvec"))),
                    lambda s: s.cbvec,
                )
            ).alias("vhat")
        )
    )


def _cross_products(joined: DataFrame, d: int):
    """Σ ŷ·xᵀ over all rows — the d×d Procrustes matrix, accumulated as
    per-partition numpy partial sums (one d² row per Arrow partition) and
    folded on the driver. Never materializes more than d² doubles
    anywhere, so it is the same plan at 10^9 vectors."""
    import numpy as np
    import pandas as pd

    def part(batches):
        acc = np.zeros((d, d))
        n = 0
        for pdf in batches:
            X = np.vstack(pdf["x"].to_numpy())
            Y = np.vstack(pdf["vhat"].to_numpy())
            acc += Y.T @ X
            n += len(pdf)
        if n:
            yield pd.DataFrame({"mm": [acc.flatten().tolist()]})

    rows = joined.select("x", "vhat").mapInPandas(part, "mm array<double>").collect()
    M = np.zeros((d, d))
    for r in rows:
        M += np.asarray(r["mm"]).reshape(d, d)
    # Round before the SVD: partition-order float drift must not leak into
    # the rotation (determinism under AQE/replays).
    return np.round(M, 6)


def opq_train(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_sub: int = 8,
    ksub: int = 16,
    iters: int = 3,
    pq_iters: int = 2,
):
    """Optimized Product Quantization (OPQ, non-parametric alternation):
    learn an orthogonal rotation R that aligns the vector distribution
    with the PQ subspace grid before encoding, shrinking quantization
    error vs plain PQ at the same bit budget.

    Alternation per iteration: (1) rotate the corpus, (2) train PQ
    codebooks on the rotated vectors (:func:`pq_train`), (3) decode the
    reconstructions, (4) solve the orthogonal Procrustes problem
    ``min_R Σ||R·x − ŷ||²`` — SVD of the d×d matrix Σ ŷ·xᵀ on the driver
    (d=64: trivial), with the matrix itself reduced distributed
    (:func:`_cross_products`). Vectors never reach the driver.

    Deterministic end to end: pq_train's seeded Lloyd, rounded Procrustes
    input, and SVD sign ambiguity cancels inside U·Vᵀ. Returns
    ``(R, codebook)`` with the codebook trained against the final R.
    """
    import numpy as np

    d = int(df.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    assert d % num_sub == 0, "num_sub must divide the embedding dim"
    dsub = d // num_sub
    x = df.select(
        F.col(id_col).alias("_k"), as_double(F.col(vec_col)).alias("x")
    ).localCheckpoint(eager=True)

    R = np.eye(d)
    for _ in range(iters):
        y = _rotate_vecs(x, R, id_col="_k", vec_col="x", out="v")
        # Persist the rotated subvector relation for the alternation's
        # lifetime (optimization round 11): pq_train's seed window + its
        # Lloyd assignments + the reconstruction each re-ran the rotation
        # pandas UDF and the subspace explode (~4 full corpus passes per
        # alternation); one MEMORY_AND_DISK materialization replaces them
        # (guide §5: cache what is reused and expensive to recompute —
        # here a per-row matmul crossing the Python boundary).
        sub = _sub_rows(
            y, key_col="_k", vec_alias="v", num_sub=num_sub, dsub=dsub
        ).persist()
        cb = pq_train(
        sub, key_col="_k", num_sub=num_sub, ksub=ksub, iters=pq_iters,
        complete_keys=True,
    )
        vhat = _pq_reconstruct(sub, cb, key_col="_k")
        M = _cross_products(x.join(vhat, "_k"), d)
        sub.unpersist()  # M is collected; nothing lazy still needs sub
        U, _, Vt = np.linalg.svd(M)
        R = U @ Vt
    # Final codebook against the final rotation.
    y = _rotate_vecs(x, R, id_col="_k", vec_col="x", out="v")
    sub = _sub_rows(
        y, key_col="_k", vec_alias="v", num_sub=num_sub, dsub=dsub
    ).persist()
    cb = pq_train(
        sub, key_col="_k", num_sub=num_sub, ksub=ksub, iters=pq_iters,
        complete_keys=True,
    )
    sub.unpersist()  # cb is localCheckpointed inside pq_train
    return R, cb


def pq_reconstruction_error(
    df: DataFrame,
    R,
    codebook: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_sub: int = 8,
) -> float:
    """Mean squared quantization error ``avg ||R·x − decode(encode(R·x))||²``
    — the objective OPQ minimizes; used by tests to prove the rotation
    beats identity."""
    d = int(df.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    dsub = d // num_sub
    y = _rotate_vecs(df, R, id_col=id_col, vec_col=vec_col, out="v").select(
        F.col(id_col).alias("_k"), "v"
    )
    sub = _sub_rows(y, key_col="_k", vec_alias="v", num_sub=num_sub, dsub=dsub)
    vhat = _pq_reconstruct(sub, codebook, key_col="_k")
    row = (
        y.join(vhat, "_k")
        .select(l2sq(F.col("v"), F.col("vhat")).alias("e"))
        .agg(F.avg("e").alias("mse"))
        .first()
    )
    return float(row["mse"])


def opq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    num_sub: int = 8,
    ksub: int = 16,
    rerank: int = 32,
    iters: int = 3,
) -> DataFrame:
    """OPQ-rotated flat-PQ top-k: rotate corpus and queries with the
    learned R, score by asymmetric distance over the 8-byte codes
    (per-query LUT broadcast), exact-cosine re-rank of the shortlist on
    the RAW vectors. Same ADC shape as :func:`ivf_pq_topk`; the rotation
    costs one Arrow matmul pass on each side."""
    R, cb = opq_train(
        corpus, id_col=id_col, vec_col=vec_col, num_sub=num_sub, ksub=ksub,
        iters=iters,
    )
    d = int(corpus.select(F.size(F.col(vec_col)).alias("d")).first()["d"])
    dsub = d // num_sub

    c_rot = _rotate_vecs(corpus, R, id_col=id_col, vec_col=vec_col, out="v").select(
        F.col(id_col).alias("neighbor_id"), "v"
    )
    c_sub = _sub_rows(c_rot, key_col="neighbor_id", vec_alias="v",
                      num_sub=num_sub, dsub=dsub)
    codes = _argmin_code(c_sub, cb, key_col="neighbor_id")

    q_rot = _rotate_vecs(queries, R, id_col=id_col, vec_col=vec_col, out="v").select(
        F.col(id_col).alias("query_id"), "v"
    )
    q_sub = _sub_rows(q_rot, key_col="query_id", vec_alias="v",
                      num_sub=num_sub, dsub=dsub)
    lut = q_sub.join(F.broadcast(cb), "m").select(
        "query_id", "m", "code",
        F.round(l2sq(F.col("sub"), F.col("cbvec")), 9).alias("pdist"),
    )
    adc = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(F.round(F.sum("pdist"), 6).alias("adc_dist"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    shortlist = (
        adc.withColumn("_rn", F.row_number().over(w_adc))
        .filter(F.col("_rn") <= rerank)
        .select("query_id", "neighbor_id")
    )
    c_raw = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double(F.col(vec_col)).alias("cv")
    )
    q_raw = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    rescored = (
        shortlist.join(c_raw, "neighbor_id")
        .join(F.broadcast(q_raw), "query_id")
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _sql_rot_cte(R, table: str, *, name: str = "rot") -> str:
    """CTE rotating every vector of ``table`` by the literal matrix ``R``
    (rows embedded as exact round-trip double literals):
    ``v[j] = dot(R[j,:], x)`` — the same orientation as
    :func:`_rotate_vecs`'s ``X @ R.T``."""
    rows = ",\n       ".join(
        "[" + ", ".join(repr(float(w)) for w in row) + "]" for row in R
    )
    return f"""{name} AS MATERIALIZED (
  SELECT vec_id,
         list_transform([
       {rows}
     ], r -> list_dot_product(r, elist)) AS v
  FROM (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS elist
        FROM {table})
)"""


def _sql_pq_chain(
    *,
    num_sub: int,
    dsub: int,
    ksub: int,
    pq_iters: int,
    sub_sql: str | None = None,
) -> list[str]:
    """CTE chain replaying :func:`pq_train` + the final encode: grouped
    lowest-id seeds, ``pq_iters`` Lloyd rounds (round-6 squared-L2
    argmin, code tie-break via struct min, empty-code retention), final
    assignment in ``as{pq_iters}``, final codebook in ``cb{pq_iters}``.
    Same discipline as the IVF-PQ oracle's loop.

    By default the training rows ``sub (vec_id, m, sub)`` are the
    ``num_sub`` subspace slices of the rotated vectors in CTE ``rot``
    (the OPQ use). Pass ``sub_sql`` to train over ANY grouped row set
    with that shape — e.g. the hierarchical-IVF use, where ``m`` is the
    level-1 cluster id and ``sub`` the full vector (per-cluster k-means
    IS pq_train with a different grouping)."""
    if sub_sql is None:
        sub_sql = f"""
  SELECT vec_id, CAST(u.m AS INT) AS m,
         list_transform(range(u.m * {dsub} + 1, u.m * {dsub} + {dsub} + 1),
                        i -> v[i]) AS sub
  FROM rot, unnest(range(0, {num_sub})) AS u(m)"""
    parts = [
        f"""sub AS MATERIALIZED ({sub_sql}
)""",
        f"""cb0 AS MATERIALIZED (
  SELECT m, CAST(rn - 1 AS INT) AS code, sub AS cbvec
  FROM (
    SELECT m, sub,
           row_number() OVER (PARTITION BY m ORDER BY vec_id) AS rn
    FROM sub
  ) WHERE rn <= {ksub}
)""",
    ]
    l2_sub_cb = SQL_L2SQ.format(a="s.sub", b="cb.cbvec")
    for r in range(pq_iters + 1):  # pq_iters training rounds + final encode
        parts.append(
            f"""as{r} AS MATERIALIZED (
  SELECT vec_id, m,
         (min(struct_pack(d := d6, code := code))).code AS code
  FROM (
    SELECT s.vec_id, s.m, cb.code,
           round({l2_sub_cb}, 6) AS d6
    FROM sub s JOIN cb{r} cb USING (m)
  ) GROUP BY vec_id, m
)"""
        )
        if r == pq_iters:
            break
        parts.append(
            f"""cb{r + 1} AS MATERIALIZED (
  SELECT cb.m, cb.code, coalesce(n.new_cbvec, cb.cbvec) AS cbvec
  FROM cb{r} cb LEFT JOIN (
    SELECT m, code, list(cv ORDER BY pos) AS new_cbvec
    FROM (
      SELECT a.m, a.code, u.i AS pos, avg((s.sub)[u.i]) AS cv
      FROM as{r} a
      JOIN sub s ON s.vec_id = a.vec_id AND s.m = a.m,
           unnest(range(1, {dsub} + 1)) AS u(i)
      GROUP BY a.m, a.code, u.i
    ) GROUP BY m, code
  ) n ON n.m = cb.m AND n.code = cb.code
)"""
        )
    return parts


# Generated-oracle cache: keyed by every parameter; the generator runs a
# DuckDB training replay (~1s), and the driver/tests may resolve oracles
# repeatedly in one process.
_SQL_OPQ_CACHE: dict = {}


def sql_opq_topk(
    sf_dir: str,
    *,
    table: str = "embeddings",
    query_pred: str = "vec_id < 10",
    k: int = 5,
    num_sub: int = 8,
    ksub: int = 16,
    rerank: int = 32,
    iters: int = 2,
    pq_iters: int = 2,
    dim: int = 64,
) -> str:
    """Exact DuckDB oracle for :func:`opq_topk`, generated per scale
    factor: the OPQ TRAINING itself is independently replayed — every
    distributed step (rotate, subspace explode, seeded Lloyd codebooks,
    reconstruction, the d×d Procrustes cross-product Σ ŷ·xᵀ rounded to 6
    decimals) runs in DuckDB SQL, and only the 64×64 SVD runs in numpy,
    exactly as the Spark implementation solves it driver-side
    (:func:`opq_train`). The converged rotation is then FROZEN as
    round-trip double literals inside ONE final SQL string that replays
    rotate → PQ train → encode → LUT (round-9) → ADC (round-6) →
    shortlist → exact-cosine re-rank.

    Why this matches bit-for-bit: both engines make every discrete
    decision (seed pick, code argmin, probe/shortlist ranks) on round-6/
    round-9 values whose cross-engine drift is ≤ ~1e-12 (double-sum
    ordering), and both hand the SAME rounded Procrustes matrix to the
    same numpy SVD — so the learned R, all codes, and the final ranks
    coincide, and the output cosines are computed from identical RAW
    vectors on both sides (round-6).
    """
    key = (sf_dir, table, query_pred, k, num_sub, ksub, rerank, iters, pq_iters, dim)
    cached = _SQL_OPQ_CACHE.get(key)
    if cached is not None:
        return cached

    import duckdb
    import numpy as np

    assert dim % num_sub == 0
    dsub = dim // num_sub
    from stock_streaming_data_pipeline_spark.tables import duck_glob

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * "
        f"FROM read_parquet('{duck_glob(sf_dir, table)}')"
    )

    def round_M(R) -> "np.ndarray":
        parts = [_sql_rot_cte(R, table)]
        parts += _sql_pq_chain(num_sub=num_sub, dsub=dsub, ksub=ksub, pq_iters=pq_iters)
        parts.append(
            f"""vhat AS MATERIALIZED (
  SELECT a.vec_id, flatten(list(cb.cbvec ORDER BY a.m)) AS vh
  FROM as{pq_iters} a
  JOIN cb{pq_iters} cb ON cb.m = a.m AND cb.code = a.code
  GROUP BY a.vec_id
)"""
        )
        body = ",\n".join(parts)
        sql = f"""
WITH {body}
SELECT ui.i AS i, uj.j AS j,
       round(sum(h.vh[ui.i] * (e.embedding)[uj.j]::DOUBLE), 6) AS mv
FROM vhat h JOIN {table} e ON e.vec_id = h.vec_id,
     unnest(range(1, {dim} + 1)) AS ui(i),
     unnest(range(1, {dim} + 1)) AS uj(j)
GROUP BY 1, 2
"""
        M = np.zeros((dim, dim))
        for i, j, v in con.execute(sql).fetchall():
            M[int(i) - 1][int(j) - 1] = v
        return M

    R = np.eye(dim)
    for _ in range(iters):
        U, _, Vt = np.linalg.svd(round_M(R))
        R = U @ Vt

    # Final SQL with the converged rotation frozen as literals.
    parts = [_sql_rot_cte(R, table)]
    parts += _sql_pq_chain(num_sub=num_sub, dsub=dsub, ksub=ksub, pq_iters=pq_iters)
    parts.append(
        f"""codes AS MATERIALIZED (
  SELECT vec_id AS neighbor_id, m, code FROM as{pq_iters}
)"""
    )
    parts.append(
        f"""qsub AS MATERIALIZED (
  SELECT vec_id AS query_id, CAST(u.m AS INT) AS m,
         list_transform(range(u.m * {dsub} + 1, u.m * {dsub} + {dsub} + 1),
                        i -> v[i]) AS qs
  FROM rot, unnest(range(0, {num_sub})) AS u(m)
  WHERE {query_pred}
)"""
    )
    l2_q_cb = SQL_L2SQ.format(a="q.qs", b="cb.cbvec")
    parts.append(
        f"""lut AS MATERIALIZED (
  SELECT q.query_id, q.m, cb.code, round({l2_q_cb}, 9) AS pdist
  FROM qsub q JOIN cb{pq_iters} cb USING (m)
)"""
    )
    parts.append(
        """adc AS MATERIALIZED (
  SELECT l.query_id, c.neighbor_id, round(sum(l.pdist), 6) AS adc_dist
  FROM codes c
  JOIN lut l ON l.m = c.m AND l.code = c.code
  WHERE c.neighbor_id != l.query_id
  GROUP BY 1, 2
)"""
    )
    parts.append(
        f"""short AS (
  SELECT query_id, neighbor_id
  FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC
           ) AS rn
    FROM adc
  ) WHERE rn <= {rerank}
)"""
    )
    cos_final = _sql_cos("n.embedding", "q.embedding", 6)
    parts.append(
        f"""scored AS (
  SELECT s.query_id, s.neighbor_id, {cos_final} AS cosine
  FROM short s
  JOIN {table} n ON n.vec_id = s.neighbor_id
  JOIN {table} q ON q.vec_id = s.query_id
)"""
    )
    body = ",\n".join(parts)
    sql = f"""
WITH {body}
SELECT query_id, neighbor_id, cosine,
       CAST(row_number() OVER (
         PARTITION BY query_id ORDER BY cosine DESC, neighbor_id
       ) AS BIGINT) AS rank
FROM scored
QUALIFY rank <= {k}
"""
    _SQL_OPQ_CACHE[key] = sql
    return sql


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
