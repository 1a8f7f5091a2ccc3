"""Persisted IVF index: result parity with the in-memory operator and
partition pruning at the plan level."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import ann_index, similarity
from stock_streaming_data_pipeline_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_index_topk_matches_inmemory_ivf(spark, tmp_path):
    """Same trainer, same probes, same re-rank — the persisted path must
    return exactly what the retrain-per-query operator returns."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, path, nlist=8, iters=2)
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in ann_index.ivf_index_topk(
            spark, path, queries, k=5, nprobe=3
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in similarity.ivf_topk(
            emb, queries, k=5, nlist=8, nprobe=3, iters=2
        ).collect()
    )
    assert got == want and got


def test_index_scan_prunes_unprobed_lists(spark, tmp_path):
    """The lists scan must carry cluster_id as a PartitionFilter (pruned
    before file I/O), and the number of list directories actually read
    must equal the probed set, not nlist."""
    import glob

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") == 3)
    path = str(tmp_path / "ivf")
    ann_index.build_ivf_index(emb, path, nlist=8, iters=2)
    assert len(glob.glob(f"{path}/lists/cluster_id=*")) == 8

    out = ann_index.ivf_index_topk(spark, path, queries, k=5, nprobe=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters", 1)
    assert len(seg) == 2, "lists scan lost its partition filter"
    # one query, nprobe=3 → a static 3-value IN-list prunes 5 of 8
    # list directories before any file I/O (inputFiles() reflects the
    # pre-pruning index, so assert on the pushed filter itself)
    import re

    m = re.search(r"cluster_id#\d+ IN \(([-0-9,]+)\)", seg[1])
    assert m, seg[1][:300]
    assert len(m.group(1).split(",")) == 3


def test_incremental_add_matches_single_shot_build(spark, tmp_path):
    """An index built on half the corpus then extended with add_to_index
    answers every probe identically to an index whose LISTS contain the
    same vectors from a single assignment pass over the union (same
    frozen quantizer), and the appended vectors land in pruned
    partitions like any others."""
    from stock_streaming_data_pipeline_spark.operators import ann_index
    from stock_streaming_data_pipeline_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    first = emb.filter(F.col("vec_id") % 2 == 0)
    rest = emb.filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 6)

    inc_path = str(tmp_path / "inc")
    ann_index.build_ivf_index(first, inc_path, nlist=4, iters=2)
    ann_index.add_to_index(spark, inc_path, rest)
    got = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in ann_index.ivf_index_topk(
            spark, inc_path, queries, k=5, nprobe=2
        ).collect()
    )

    # single-shot reference: freeze the SAME quantizer (trained on
    # `first`), assign the union in one pass
    ref_path = str(tmp_path / "ref")
    ann_index.build_ivf_index(first, ref_path, nlist=4, iters=2)
    ann_index.add_to_index(spark, ref_path, rest.unionByName(first))
    # ref lists now contain first twice -> rebuild clean instead
    import shutil

    shutil.rmtree(ref_path)
    ann_index.build_ivf_index(first, ref_path, nlist=4, iters=2)
    # overwrite lists with a one-pass assignment of the union
    from stock_streaming_data_pipeline_spark.operators.similarity import (
        _nearest_centroid,
        as_double,
    )

    cents = spark.read.parquet(f"{ref_path}/centroids").select(
        F.col("cluster_id").alias("_cid"), "cvec"
    )
    union = emb.select(
        F.col("vec_id"), as_double(F.col("embedding")).alias("v")
    )
    assigned = _nearest_centroid(union, cents, key_col="vec_id", vec_alias="v")
    assigned.select("vec_id", "v", "cluster_id").write.mode(
        "overwrite"
    ).partitionBy("cluster_id").parquet(f"{ref_path}/lists")
    want = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in ann_index.ivf_index_topk(
            spark, ref_path, queries, k=5, nprobe=2
        ).collect()
    )
    assert got == want


def test_rebalance_splits_hot_lists_and_preserves_answers(spark, tmp_path):
    from pyspark.sql import functions as FF

    from stock_streaming_data_pipeline_spark.operators import ann_index
    from stock_streaming_data_pipeline_spark.tables import load_table

    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "idx")
    # deliberately coarse index -> hot lists guaranteed
    ann_index.build_ivf_index(emb, path, nlist=2, iters=1)
    queries = emb.filter(FF.col("vec_id") < 5)
    before = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in ann_index.ivf_index_topk(
            spark, path, queries, k=5, nprobe=2  # exhaustive: 2 lists
        ).collect()
    )
    n_total = emb.count()
    split = ann_index.rebalance_index(spark, path, max_list_rows=n_total // 3)
    assert split >= 1
    lists = spark.read.parquet(f"{path}/lists")
    counts = [
        r["n"]
        for r in lists.groupBy("cluster_id").agg(FF.count(FF.lit(1)).alias("n")).collect()
    ]
    assert sum(counts) == n_total  # nothing lost
    assert max(counts) <= n_total // 3 or len(counts) > 2  # finer lists
    cents = spark.read.parquet(f"{path}/centroids")
    assert cents.count() == len(counts)
    after = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["cosine"])
        for r in ann_index.ivf_index_topk(
            spark, path, queries, k=5, nprobe=cents.count()  # exhaustive again
        ).collect()
    )
    assert after == before  # exhaustive probe: identical answers


def test_ivf2_index_matches_inmemory_and_prunes_leaves(spark, tmp_path):
    """The persisted two-level index must answer exactly like the
    retrain-per-query ivf2_topk, and its lists scan must carry BOTH
    partition columns (cluster_id, subcell) as PartitionFilters — leaf
    directories outside the probed set are pruned before file I/O."""
    import glob

    from stock_streaming_data_pipeline_spark.operators import similarity

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    path = str(tmp_path / "ivf2")
    ann_index.build_ivf2_index(emb, path, nlist1=4, nlist2=4, iters=2)
    # 16 leaf directories (some may be empty-code-retained → absent)
    assert len(glob.glob(f"{path}/lists/cluster_id=*/subcell=*")) <= 16

    got = sorted(
        tuple(r)
        for r in ann_index.ivf2_index_topk(
            spark, path, queries, k=5, nprobe1=2, nprobe2=2
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in similarity.ivf2_topk(
            emb, queries, k=5, nlist1=4, nlist2=4, nprobe1=2, nprobe2=2
        ).collect()
    )
    assert got == want and got

    out = ann_index.ivf2_index_topk(spark, path, queries, k=5, nprobe1=1, nprobe2=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    seg = plan.split("PartitionFilters", 1)
    assert len(seg) == 2, "lists scan lost its partition filter"
    assert "cluster_id" in seg[1][:2000] and "subcell" in seg[1][:2000]
