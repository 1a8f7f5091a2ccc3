"""Empty-input hardening: every new-tier operator must return an empty
(or well-defined) result on empty input — not throw on a divide, an
element_at, or an empty aggregate. Empty partitions are routine at
scale (a filter that matches nothing, a probe list with no vectors)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def empty_trades(spark):
    return spark.createDataFrame(
        [], "event_type string, ts timestamp, value double, volume double"
    )


def test_finance_ops_on_empty(spark, empty_trades):
    from stock_streaming_data_pipeline_spark.operators import finance

    assert finance.vwap_bars(empty_trades).count() == 0
    assert finance.max_drawdown(empty_trades).count() == 0
    df = spark.createDataFrame([], "event_id long, event_type string, value double")
    assert finance.mad_outliers(df).count() == 0
    aligned = spark.createDataFrame(
        [], "bucket_ts timestamp, x_milli long, y_milli long"
    )
    assert finance.rolling_corr(aligned, frame=4).count() == 0


def test_retrieval_on_empty(spark):
    from stock_streaming_data_pipeline_spark.operators import retrieval

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert retrieval.bm25_topk(
        docs, ["x"], id_col="doc_id", text_col="text"
    ).count() == 0
    assert retrieval.tfidf_top_terms(
        docs, id_col="doc_id", text_col="text"
    ).count() == 0


def test_graph_kmv_fuzzy_on_empty(spark):
    from stock_streaming_data_pipeline_spark.operators import fuzzy, graph, kmv

    edges = spark.createDataFrame([], "src long, dst long")
    assert graph.pagerank(edges, iters=2).count() == 0
    df = spark.createDataFrame([], "grp string, key long")
    assert kmv.kmv_sketch(df, group_col="grp", key_col="key").count() == 0
    recs = spark.createDataFrame([], "id long, name string, grp string")
    assert fuzzy.fuzzy_pairs(
        recs, id_col="id", text_col="name", block_cols=("grp",)
    ).count() == 0


def test_zorder_on_empty_and_single_row(spark):
    from stock_streaming_data_pipeline_spark.operators import zorder

    empty = spark.createDataFrame([], "x long, y long")
    assert zorder.zorder_codes(empty, col_x="x", col_y="y").count() == 0
    one = spark.createDataFrame([(5, 7)], "x long, y long")
    # degenerate bounds (lo == hi): bucket 0, code 0 — never a div-by-zero
    row = zorder.zorder_codes(one, col_x="x", col_y="y").collect()[0]
    assert row["zcode"] == 0


def test_semdedup_and_sq_on_tiny_corpus(spark):
    import numpy as np

    from stock_streaming_data_pipeline_spark.operators import semdedup, sq_quant

    one = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    assert semdedup.semantic_drop_list(one, k=2, iters=1, threshold=0.9).count() == 0
    out = sq_quant.sq_topk(one, one, k=1, shortlist=2).collect()
    assert {r["query_id"] for r in out} == {0, 1}


def test_round5_ops_on_empty(spark):
    """RRF, DSIR and the unigram trainer on empty corpora: empty (or
    well-defined) results, no throw from empty aggregates / ln(0) /
    element_at."""
    from stock_streaming_data_pipeline_spark.operators import (
        retrieval,
        sampling,
        unigram,
    )

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert retrieval.rrf_fusion(
        docs, ["x", "y"], id_col="doc_id", text_col="text", k=5, pool=5
    ).count() == 0
    src = spark.createDataFrame([], "doc_id long, text string, source string")
    assert sampling.dsir_importance(
        src, id_col="doc_id", text_col="text",
        target_pred=F.col("source") == "t",
    ).count() == 0
    assert unigram.unigram_train(docs, text_col="text").count() == 0
    assert unigram.unigram_segment(
        docs, id_col="doc_id", text_col="text"
    ).count() == 0
    # all-target corpus: every doc is in-domain, raw side empty → no
    # scored rows, not a crash
    one = spark.createDataFrame(
        [(1, "alpha beta", "t")], "doc_id long, text string, source string"
    )
    assert sampling.dsir_importance(
        one, id_col="doc_id", text_col="text",
        target_pred=F.col("source") == "t",
    ).count() == 0
