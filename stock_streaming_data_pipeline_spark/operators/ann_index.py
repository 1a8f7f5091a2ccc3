"""Persisted IVF index: inverted lists as Hive partitions.

The in-memory ANN operators (similarity.py) retrain their coarse
quantizer per query — right for tests, wrong for a production corpus
that is indexed once and probed millions of times. This module persists
the index the way a 100 TB deployment would:

- ``build_ivf_index`` trains the coarse quantizer once, assigns every
  vector, and writes the corpus **partitioned by cluster_id** (one
  directory per inverted list) plus a tiny centroids table.
- ``ivf_index_topk`` reads the centroids (KBs), picks each query's
  ``nprobe`` lists, and scans ONLY those partitions — the
  ``cluster_id IN (...)`` predicate prunes at the directory level
  (PartitionFilters, no file of an unprobed list is even opened), which
  is exactly FAISS's on-disk inverted-list layout expressed as Hive
  partitioning. Probe I/O is corpus x nprobe / nlist instead of a full
  scan.

Equivalence with the retrain-per-query operator and the plan-level
pruning are pinned in tests/test_ann_index.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators.similarity import (
    _nearest_centroid,
    as_double,
    cosine,
    ivf_train,
)


def build_ivf_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    iters: int = 2,
) -> None:
    """Train + assign + persist: ``{path}/lists`` holds the vectors
    partitioned by cluster_id; ``{path}/centroids`` the nlist centroid
    vectors. Both parquet — readable by any engine."""
    cents = ivf_train(
        corpus, id_col=id_col, vec_col=vec_col, nlist=nlist, iters=iters
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    assigned = _nearest_centroid(c, cents, key_col="vec_id", vec_alias="v")
    (
        assigned.select("vec_id", "v", "cluster_id")
        .write.mode("overwrite")
        .partitionBy("cluster_id")
        .parquet(f"{path}/lists")
    )
    cents.select(F.col("_cid").alias("cluster_id"), "cvec").write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def ivf_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """Probe a persisted IVF index: centroid scoring happens on the tiny
    centroids table; the big ``lists`` scan carries a partition-column
    semi-join on the probed cluster_ids, so unprobed list directories
    are pruned before any file I/O."""
    cents = spark.read.parquet(f"{path}/centroids")
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    q_scored = q.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", F.round(cosine(F.col("qv"), F.col("cvec")), 6)
    )
    w_probe = Window.partitionBy("query_id").orderBy(
        F.desc("_sim"), F.asc("cluster_id")
    )
    q_probes = (
        q_scored.withColumn("_rn", F.row_number().over(w_probe))
        .filter(F.col("_rn") <= nprobe)
        .select("query_id", "qv", "cluster_id")
    )
    lists = spark.read.parquet(f"{path}/lists")
    # Partition pruning: the probed cluster_ids are a tiny driver-side
    # set (<= queries x nprobe values, and the index's nlist bounds it);
    # an IN-list literal predicate prunes list directories at planning
    # time. This is metadata-sized by construction — never corpus data.
    probed = [
        r["cluster_id"]
        for r in q_probes.select("cluster_id").distinct().collect()
    ]
    pruned = lists.filter(F.col("cluster_id").isin(probed))
    scored = (
        pruned.join(F.broadcast(q_probes), "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("v")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def build_ivf2_index(
    corpus: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist1: int = 4,
    nlist2: int = 4,
    iters: int = 2,
) -> None:
    """Persist a HIERARCHICAL (two-level) IVF index: vectors partitioned
    by ``cluster_id/subcell`` (one directory per LEAF), the level-1
    centroids and the per-cell sub-centroids as tiny side tables. The
    training is byte-identical to :func:`similarity.ivf2_topk` (cosine
    Lloyd coarse cells, pq_train per-cell sub-quantizer), so a probe of
    the persisted index answers exactly like the retrain-per-query
    operator — and leaf directories give probes two levels of partition
    pruning (corpus × (nprobe1·nprobe2)/(nlist1·nlist2) I/O)."""
    from stock_streaming_data_pipeline_spark.operators.similarity import (
        _argmin_code,
        pq_train,
    )

    cents1 = ivf_train(
        corpus, id_col=id_col, vec_col=vec_col, nlist=nlist1, iters=iters
    )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    a1 = _nearest_centroid(c, cents1, key_col="vec_id", vec_alias="v")
    rows = a1.select(
        "vec_id", F.col("cluster_id").alias("m"), F.col("v").alias("sub")
    )
    cb2 = pq_train(rows, key_col="vec_id", num_sub=nlist1, ksub=nlist2, iters=iters)
    codes = _argmin_code(rows, cb2, key_col="vec_id")
    (
        a1.join(codes.select("vec_id", F.col("code").alias("subcell")), "vec_id")
        .select("vec_id", "v", "cluster_id", "subcell")
        .write.mode("overwrite")
        .partitionBy("cluster_id", "subcell")
        .parquet(f"{path}/lists")
    )
    cents1.select(F.col("_cid").alias("cluster_id"), "cvec").write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")
    cb2.select(
        F.col("m").alias("cluster_id"), F.col("code").alias("subcell"), "cbvec"
    ).write.mode("overwrite").parquet(f"{path}/subcentroids")


def ivf2_index_topk(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe1: int = 2,
    nprobe2: int = 2,
) -> DataFrame:
    """Probe the persisted two-level index: descend centroids →
    sub-centroids on the tiny side tables, then scan ONLY the reached
    leaf directories (a boolean partition predicate over
    (cluster_id, subcell) prunes before any file I/O)."""
    from stock_streaming_data_pipeline_spark.operators.similarity import l2sq

    cents = spark.read.parquet(f"{path}/centroids")
    subcents = spark.read.parquet(f"{path}/subcentroids")
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("qv")
    )
    q1 = q.crossJoin(F.broadcast(cents)).withColumn(
        "_sim", F.round(cosine(F.col("qv"), F.col("cvec")), 6)
    )
    w1 = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("cluster_id"))
    probes1 = (
        q1.withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= nprobe1)
        .select("query_id", "qv", "cluster_id")
    )
    q2 = probes1.join(F.broadcast(subcents), "cluster_id").withColumn(
        "_d", F.round(l2sq(F.col("qv"), F.col("cbvec")), 6)
    )
    w2 = Window.partitionBy("query_id", "cluster_id").orderBy(
        F.asc("_d"), F.asc("subcell")
    )
    probes2 = (
        q2.withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= nprobe2)
        .select("query_id", "qv", "cluster_id", "subcell")
    )
    # Driver-side leaf set (≤ queries × nprobe1 × nprobe2, bounded by the
    # index's nlist1 × nlist2): a partition-column predicate prunes leaf
    # directories at planning time — metadata-sized by construction.
    leaves = {
        (r["cluster_id"], r["subcell"])
        for r in probes2.select("cluster_id", "subcell").distinct().collect()
    }
    pred = None
    for cid, sub in sorted(leaves):
        clause = (F.col("cluster_id") == cid) & (F.col("subcell") == sub)
        pred = clause if pred is None else (pred | clause)
    lists = spark.read.parquet(f"{path}/lists").filter(pred)
    scored = (
        lists.join(F.broadcast(probes2), ["cluster_id", "subcell"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn("cosine", F.round(cosine(F.col("qv"), F.col("v")), 6))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def add_to_index(
    spark: SparkSession,
    path: str,
    new_vectors: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Incremental index maintenance: assign NEW vectors against the
    EXISTING centroids and append them to their inverted-list partitions
    — no retrain, no rewrite of existing lists (dynamic partition
    overwrite is not needed because appends go to new files inside each
    list directory). This is how a production IVF index absorbs an
    ingest batch; the quantizer drifts only if the data distribution
    does, at which point build_ivf_index re-trains offline.

    The assignment rule is byte-identical to the build path
    (_nearest_centroid: round-6 cosine, cluster-id tie-breaks), so an
    index built incrementally answers probes identically to one built
    in a single shot over the union — pinned in tests/test_ann_index.py.
    """
    cents = spark.read.parquet(f"{path}/centroids").select(
        F.col("cluster_id").alias("_cid"), "cvec"
    )
    c = new_vectors.select(
        F.col(id_col).alias("vec_id"), as_double(F.col(vec_col)).alias("v")
    )
    assigned = _nearest_centroid(c, cents, key_col="vec_id", vec_alias="v")
    (
        assigned.select("vec_id", "v", "cluster_id")
        .write.mode("append")
        .partitionBy("cluster_id")
        .parquet(f"{path}/lists")
    )


def rebalance_index(
    spark: SparkSession,
    path: str,
    *,
    max_list_rows: int,
    iters: int = 2,
) -> int:
    """Index maintenance part 2: SPLIT oversized inverted lists. After
    many add_to_index batches a hot list can grow past the probe budget;
    this re-trains 2 sub-centroids WITHIN each oversized list (local
    Lloyd on that list's vectors only — never a global retrain), rewrites
    its members under fresh cluster ids, swaps the centroid rows, and
    drops the old partition directory. Probes see a finer quantizer with
    the same corpus; with exhaustive nprobe the answers are unchanged
    (pinned in tests). Returns how many lists were split.

    The per-split work is one tiny Spark job per hot list (lists over
    budget are few by construction); everything else stays on disk
    untouched."""
    from pyspark.sql import functions as F

    from stock_streaming_data_pipeline_spark.operators.similarity import (
        _nearest_centroid,
        ivf_train,
    )
    from stock_streaming_data_pipeline_spark.streaming.sinks import _hadoop_fs

    lists = spark.read.parquet(f"{path}/lists")
    counts = {
        r["cluster_id"]: r["n"]
        for r in lists.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    cents = spark.read.parquet(f"{path}/centroids")
    next_cid = max(counts) + 1 if counts else 0
    split = 0
    for cid, n in sorted(counts.items()):
        if n <= max_list_rows:
            continue
        members = lists.filter(F.col("cluster_id") == cid).select("vec_id", "v")
        sub_cents = ivf_train(
            members, id_col="vec_id", vec_col="v", nlist=2, iters=iters
        )
        assigned = _nearest_centroid(
            members.select(F.col("vec_id").alias("_vid"), F.col("v")),
            sub_cents,
            key_col="_vid",
            vec_alias="v",
        )
        out = assigned.select(
            F.col("_vid").alias("vec_id"),
            "v",
            (F.col("cluster_id") + F.lit(next_cid)).alias("cluster_id"),
        )
        out.write.mode("append").partitionBy("cluster_id").parquet(f"{path}/lists")
        # swap centroid rows: drop cid, add the two sub-centroids
        cents = cents.filter(F.col("cluster_id") != cid).unionByName(
            sub_cents.select(
                (F.col("_cid") + F.lit(next_cid)).alias("cluster_id"), "cvec"
            )
        )
        fs, _ = _hadoop_fs(spark, path)
        fs.delete(
            spark._jvm.org.apache.hadoop.fs.Path(
                f"{path}/lists/cluster_id={cid}"
            ),
            True,
        )
        next_cid += 2
        split += 1
    if split:
        # publish the new centroid table (tiny; overwrite via temp swap)
        cents.localCheckpoint(eager=True).write.mode("overwrite").parquet(
            f"{path}/centroids"
        )
    return split
