"""Behavioral tests for semantic dedup (operators/semdedup.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import semdedup


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_planted_near_identical_pair_is_dropped(spark):
    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 8))
    # vec 13 := vec 2 plus a tiny perturbation -> cosine ~1
    base[13] = base[2] + 0.001 * rng.normal(size=8)
    out = semdedup.semantic_drop_list(
        _emb(spark, base), k=4, iters=2, threshold=0.95
    ).collect()
    assert [(r["vec_id"], r["keeper_id"]) for r in out] == [(13, 2)]
    assert out[0]["max_cos"] > 0.99


def test_identical_triple_keeps_lowest_id(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(12, 6))
    base[7] = base[3]
    base[9] = base[3]
    out = {
        r["vec_id"]: r
        for r in semdedup.semantic_drop_list(
            _emb(spark, base), k=3, iters=1, threshold=0.999
        ).collect()
    }
    assert set(out) == {7, 9}
    assert out[7]["keeper_id"] == 3
    assert out[9]["keeper_id"] == 3
    # 9 collides with both 3 and 7
    assert out[9]["n_collisions"] == 2


def test_pairs_are_subset_of_global_pairs(spark):
    """Cluster-bounded pairs never invent a pair the exact global search
    wouldn't find (recall<=1, precision==1 vs the brute-force graph)."""
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8))
    df = _emb(spark, vecs)
    got = {
        (r["vec_a"], r["vec_b"])
        for r in semdedup.semantic_pairs(
            df, k=4, iters=2, threshold=0.5
        ).collect()
    }
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.triu(n @ n.T, 1)
    exact = {
        (int(i), int(j))
        for i, j in zip(*np.where(np.round(sims, 6) >= 0.5))
    }
    assert got <= exact


def test_orthogonal_vectors_produce_no_drops(spark):
    eye = np.eye(6)
    out = semdedup.semantic_drop_list(
        _emb(spark, eye), k=2, iters=1, threshold=0.5
    ).collect()
    assert out == []
