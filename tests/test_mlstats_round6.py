"""Property tests for the round-6 classical-ML/stats tier.

The catalog queries carry exact DuckDB oracles; these tests pin the
OPERATOR-level mathematical properties the oracles can't see — the
claims a user relies on when pointing the operator at their own data:
power iteration converges to the dominant eigenvector, the covariance
of constants is zero, HITS scores match the hand-computed bipartite
matvecs, containment hits 1.0 for true substrings, and the DCT
perceptual hash is invariant to uniform brightness shift (the property
that makes it PERCEPTUAL rather than byte-exact).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from stock_streaming_data_pipeline_spark.session import get_spark

    return get_spark("test-mlstats-r6")


def test_pca_power_iteration_dominant_eigenvector(spark):
    """On a diagonal 2x2 covariance diag(4, 1) the iteration must land
    exactly on e0: (1e6, 0) after renormalization."""
    from stock_streaming_data_pipeline_spark.operators import pca

    cov = spark.createDataFrame(
        [(0, 0, 4), (0, 1, 0), (1, 0, 0), (1, 1, 1)], "i INT, j INT, c LONG"
    ).select("i", "j", F.col("c").cast("decimal(38,0)").alias("c"))
    v = {r["i"]: r["v"] for r in pca.power_iteration(cov, rounds=6).collect()}
    # convergence is geometric at the eigenvalue ratio (1/4 per round):
    # v1 = round(1e6 / 4^6) = 244 exactly, deterministic in both engines
    assert v == {0: 1_000_000, 1: 244}


def test_pca_covariance_of_constants_is_zero(spark):
    """Centered covariance of identical vectors must be exactly zero in
    every cell (the n-scaled integer identity n*Sxx - Sx*Sy)."""
    from stock_streaming_data_pipeline_spark.operators import pca

    df = spark.createDataFrame(
        [(i, [0.25, -0.5, 1.0]) for i in range(5)],
        "vec_id LONG, embedding ARRAY<FLOAT>",
    )
    cov = pca.covariance_rows(df, id_col="vec_id", vec_col="embedding")
    assert cov.count() == 9
    assert cov.filter(F.col("c") != 0).count() == 0


def test_pca_rayleigh_dominates_trace_share(spark):
    """On anisotropic synthetic vectors the PC1 explained-variance ratio
    must exceed 1/d (it is the LARGEST eigenvalue's share)."""
    from stock_streaming_data_pipeline_spark.operators import pca

    rows = [(i, [float((i % 7) - 3), 0.01 * ((i * 3) % 5), 0.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    cov = pca.covariance_rows(df, id_col="vec_id", vec_col="embedding")
    v = pca.power_iteration(cov, rounds=8)
    # dominant axis is dimension 0 by construction
    top = {r["i"]: abs(r["v"]) for r in v.collect()}
    assert top[0] == 1_000_000
    assert top[1] < 200_000 and top[2] < 200_000


def test_hits_star_graph_exact_scores(spark):
    """Star bipartite graph: users u1..u3 all buy item A; u1 also buys
    B. Hand-unrolled 1-round HITS: hub(u)=deg, auth(i)=sum hubs."""
    from stock_streaming_data_pipeline_spark.operators import graph

    e = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 100), (1, 200)], "u LONG, i LONG"
    )
    hub, auth = graph.hits(e, rounds=1)
    hubs = {r["u"]: int(r["h"]) for r in hub.collect()}
    auths = {r["i"]: int(r["a"]) for r in auth.collect()}
    # auth_0 = 1 everywhere; hub_1(u1)=2, others 1
    assert hubs == {1: 2, 2: 1, 3: 1}
    # auth_1(A) = 2+1+1 = 4, auth_1(B) = hub(u1) = 2
    assert auths == {100: 4, 200: 2}


def test_containment_substring_hits_one(spark):
    """A document embedded verbatim in a longer one must score
    cont_ab = 1.0 even when Jaccard would be far below threshold."""
    from stock_streaming_data_pipeline_spark.operators import dedup

    short = "alpha beta gamma delta epsilon zeta"
    long = short + " " + " ".join(f"tok{i} filler{i} pad{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id LONG, text STRING"
    )
    out = dedup.containment_pairs(
        df, id_col="doc_id", text_col="text", n=3, threshold=0.9
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["cont_ab"] == 1.0 and r["cont_ba"] < 0.9


def test_phash_brightness_invariance(spark):
    """Uniformly brightening every pixel must not change the hash: the
    DCT is mean-centered, so a constant offset cancels exactly — the
    property that makes the hash perceptual. A structural change must
    flip at least one bit."""
    from stock_streaming_data_pipeline_spark.plans.llmdata import phash_from_docs

    base = "abcdefgh" * 8  # 64 bytes -> 8x8 image
    brighter = "".join(chr(ord(c) + 5) for c in base)
    scrambled = base[::-1]
    docs = spark.createDataFrame(
        [(1, base), (2, brighter), (3, scrambled)], "doc_id LONG, text STRING"
    )
    ph = {r["media_id"]: r["phash"] for r in phash_from_docs(spark, docs).collect()}
    assert ph[1] == ph[2]
    assert ph[1] != ph[3]
