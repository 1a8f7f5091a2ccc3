"""Behavioral tests for the SQ8 scalar-quantization tier."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import sq_quant


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_codes_cover_full_byte_range_and_bounds(spark):
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(50, 4))
    df = _emb(spark, vecs)
    grid = sq_quant.sq_train(df)
    codes = sq_quant.sq_encode(df, grid).collect()
    flat = [c for r in codes for c in r["code"]]
    assert min(flat) == 0.0 and max(flat) == 255.0  # extremes hit the rails
    assert all(0.0 <= c <= 255.0 and c == int(c) for c in flat)


def test_reconstruction_error_bounded_by_half_step(spark):
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(30, 6))
    df = _emb(spark, vecs)
    grid = sq_quant.sq_train(df)
    recon = {
        r["_sqid"]: np.array(r["recon"])
        for r in sq_quant.sq_reconstruct(
            sq_quant.sq_encode(df, grid), grid
        ).collect()
    }
    lo, hi = vecs.min(axis=0), vecs.max(axis=0)
    half_step = (hi - lo) / 255.0 / 2.0
    for i, v in enumerate(vecs.astype(np.float32).astype(float)):
        err = np.abs(recon[i] - v)
        assert (err <= half_step + 1e-9).all()


def test_constant_dimension_encodes_and_reconstructs_exactly(spark):
    vecs = [[1.0, 5.0], [2.0, 5.0], [3.0, 5.0]]
    df = _emb(spark, vecs)
    grid = sq_quant.sq_train(df)
    recon = {
        r["_sqid"]: r["recon"]
        for r in sq_quant.sq_reconstruct(
            sq_quant.sq_encode(df, grid), grid
        ).collect()
    }
    assert all(abs(recon[i][1] - 5.0) < 1e-12 for i in range(3))


def test_sq_topk_recall_vs_brute_force(spark):
    """SQ8 on an 8-bit grid is high-fidelity: with a 4x shortlist the
    top-5 should match brute force almost everywhere (recall >= 0.9)."""
    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(120, 12))
    df = _emb(spark, vecs)
    queries = df.filter(F.col("vec_id") < 8)
    got = sq_quant.sq_topk(df, queries, k=5, shortlist=20).collect()
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = n @ n.T
    hits = total = 0
    for q in range(8):
        s = np.round(sims[q], 6).copy()
        s[q] = -2
        exact = set(np.lexsort((np.arange(len(s)), -s))[:5])
        approx = {r["neighbor_id"] for r in got if r["query_id"] == q}
        hits += len(exact & approx)
        total += 5
    assert hits / total >= 0.9
