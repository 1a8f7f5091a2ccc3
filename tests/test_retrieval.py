"""Behavioral tests for the lexical-retrieval tier (operators/retrieval.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import retrieval


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_ranks_exclusive_term_doc_first(spark):
    # 'zebra' appears only in doc 0; all docs share filler terms, so the
    # rare term's idf dominates and doc 0 must rank first.
    docs = _docs(
        spark,
        [
            "zebra apple banana apple",
            "apple banana apple banana",
            "banana apple banana apple",
            "apple apple banana banana",
        ],
    )
    out = retrieval.bm25_topk(
        docs, ["zebra", "apple"], id_col="doc_id", text_col="text", k=4
    ).collect()
    assert out[0]["doc"] == 0
    assert len(out) == 4
    assert all(out[0]["bm25"] > r["bm25"] for r in out[1:])


def test_bm25_score_zero_docs_excluded(spark):
    docs = _docs(spark, ["alpha beta", "gamma delta"])
    out = retrieval.bm25_topk(
        docs, ["alpha"], id_col="doc_id", text_col="text", k=10
    ).collect()
    assert [r["doc"] for r in out] == [0]


def test_bm25_tf_saturation(spark):
    # BM25 saturates in tf: 10 repeats must score less than 10x one hit,
    # but still more than a single hit (same dl so the dl term cancels).
    docs = _docs(
        spark,
        [
            "cat " + "dog " * 9,
            "cat cat cat cat cat cat cat cat cat dog",
        ],
    )
    out = {
        r["doc"]: r["bm25"]
        for r in retrieval.bm25_topk(
            docs, ["cat"], id_col="doc_id", text_col="text", k=2
        ).collect()
    }
    assert out[1] > out[0]
    assert out[1] < 10 * out[0]


def test_tfidf_rank_ties_break_on_term(spark):
    # both terms occur once in doc 0 and in one other doc each -> equal
    # tfidf; rank order must be alphabetical.
    docs = _docs(spark, ["alpha beta", "alpha gamma", "beta gamma"])
    out = retrieval.tfidf_top_terms(
        docs, id_col="doc_id", text_col="text", top=2
    ).collect()
    doc0 = sorted(
        [(r["rank"], r["term"]) for r in out if r["doc"] == 0]
    )
    assert doc0 == [(1, "alpha"), (2, "beta")]


def test_tfidf_ubiquitous_term_scores_zero(spark):
    # a term in every document has idf = ln(1) = 0.
    docs = _docs(spark, ["the cat", "the dog", "the fox"])
    out = retrieval.tfidf_top_terms(
        docs, id_col="doc_id", text_col="text", top=2
    ).collect()
    the_scores = [r["tfidf"] for r in out if r["term"] == "the"]
    assert all(s == 0.0 for s in the_scores)


def test_bm25_plan_broadcasts_query_and_stats(spark):
    docs = _docs(spark, ["alpha beta gamma"] * 4)
    plan = retrieval.bm25_topk(
        docs, ["alpha"], id_col="doc_id", text_col="text"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # top-k is a TakeOrdered, not a global sort
    assert "TakeOrderedAndProject" in plan


def test_hash_embed_feeds_ann_tier(spark):
    """The hashing-trick embeddings must slot straight into the
    similarity tier: near-duplicate TEXTS land near each other in the
    hashed space, and cosine_topk runs unchanged over the output."""
    from stock_streaming_data_pipeline_spark.operators import similarity

    texts = [
        "spark window join table scan",
        "spark window join table scan extra",   # near-dup of 0
        "completely different words entirely here",
        "another unrelated set of tokens now",
    ]
    docs = _docs(spark, texts)
    emb = retrieval.hash_embed(docs, id_col="doc_id", text_col="text", dim=32)
    emb = emb.withColumnRenamed("doc_id", "vec_id")
    out = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=1
    ).collect()
    assert out[0]["neighbor_id"] == 1  # the near-dup text wins
    # unit norm
    rows = emb.collect()
    import math

    for r in rows:
        assert abs(math.sqrt(sum(x * x for x in r["embedding"])) - 1) < 1e-9
