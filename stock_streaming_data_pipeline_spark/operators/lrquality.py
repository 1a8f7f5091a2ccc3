"""Distributed logistic-regression quality classifier.

The fasttext-style linear quality classifier every large-scale curation
pipeline eventually trains (score documents by a learned combination of
lexical features, here distilled from the rule-based C4/Gopher filter's
keep decision): hashing-trick bag-of-words features, full-batch gradient
ascent on the log-likelihood, scoring — all as DataFrame ops.

Scale shape per iteration: features live as a (doc, idx, cnt) relation
built once and localCheckpointed; weights are a D+1-row table broadcast
into the feature join; z/p are one partial-aggregated groupBy(doc);
the gradient is one groupBy(idx). Nothing about the corpus ever sits on
the driver — at 10^9 docs each iteration is two shuffles of bounded
width (D+1 weight rows, one score row per doc).

Determinism / cross-engine contract (the Lloyd discipline, extended to
a model with transcendental math): weights live on the 1e-6 lattice
(rounded every update), logits are rounded to 6 before the sigmoid, and
probabilities are rounded to 6 after it — so the only cross-engine
divergence sources (double-sum ordering, last-ulp libm exp) are crushed
at every decision point, and the DuckDB oracle can unroll the training
iterations into chained CTEs and match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators.dedup import (
    portable_hash,
    sql_portable_hash,
    tokens,
)

DIM = 64  # hashed feature buckets; idx DIM is the bias term
_SALT = "lrq_"


def _features(docs: DataFrame, *, id_col: str, text_col: str) -> DataFrame:
    """(doc, idx, cnt): hashed token counts + a bias feature (idx=DIM,
    cnt=1) per doc."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    )
    counts = (
        toks.select(
            "doc", (portable_hash(F.col("tok"), _SALT) % DIM).alias("idx")
        )
        .groupBy("doc", "idx")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    bias = docs.select(
        F.col(id_col).alias("doc"),
        F.lit(DIM).cast("long").alias("idx"),
        F.lit(1).cast("long").alias("cnt"),
    )
    return counts.unionByName(bias)


def train_score(
    docs: DataFrame,
    labels: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    iters: int = 3,
    lr: float = 0.5,
) -> DataFrame:
    """Train ``iters`` full-batch gradient steps of logistic regression
    on hashed bag-of-words features against ``labels`` (columns
    ``doc, label`` with label in {0,1}), then score every doc. Returns
    ``(doc, label, prob, pred)`` with prob on the round-6 lattice."""
    spark = docs.sparkSession
    feats = (
        _features(docs, id_col=id_col, text_col=text_col)
        .join(labels, "doc")
        .localCheckpoint(eager=True)
    )
    n_docs = labels.count()

    weights = spark.range(DIM + 1).select(
        F.col("id").alias("idx"), F.lit(0.0).alias("w")
    )
    for _ in range(iters):
        z = (
            feats.join(F.broadcast(weights), "idx")
            .groupBy("doc", "label")
            .agg(F.round(F.sum(F.col("cnt") * F.col("w")), 6).alias("z"))
        )
        p = z.select(
            "doc",
            "label",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6).alias("p"),
        )
        grad = (
            feats.select("doc", "idx", "cnt")
            .join(F.broadcast(p), "doc")
            .groupBy("idx")
            .agg(
                F.round(
                    F.sum((F.col("label") - F.col("p")) * F.col("cnt"))
                    / F.lit(float(n_docs)),
                    6,
                ).alias("g")
            )
        )
        weights = (
            weights.join(grad, "idx", "left")
            .select(
                "idx",
                F.round(
                    F.col("w") + F.lit(lr) * F.coalesce(F.col("g"), F.lit(0.0)), 6
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )

    scored = (
        feats.join(F.broadcast(weights), "idx")
        .groupBy("doc", "label")
        .agg(F.round(F.sum(F.col("cnt") * F.col("w")), 6).alias("z"))
    )
    return scored.select(
        "doc",
        "label",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6).alias("prob"),
        (F.col("z") >= 0).alias("pred"),
    )


def sql_train_score(
    *,
    label_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    iters: int = 3,
    lr: float = 0.5,
) -> str:
    """DuckDB oracle: the same feature hash, the training loop unrolled
    into chained CTEs (one z/p/grad/w block per iteration), final scores.
    ``label_sql`` must yield columns (doc, label)."""
    toks = (
        "list_filter(regexp_split_to_array(lower("
        + text_col
        + "), '\\s+'), t -> t <> '')"
    )
    h = sql_portable_hash("tok", salt=_SALT)
    parts = [
        f"lab AS ({label_sql})",
        f"""tk AS (
  SELECT {id_col} AS doc, unnest({toks}) AS tok FROM {table}
)""",
        f"""feats AS MATERIALIZED (
  SELECT f.doc, f.idx, f.cnt, lab.label
  FROM (
    SELECT doc, ({h}) % {DIM} AS idx, count(*)::BIGINT AS cnt
    FROM tk GROUP BY 1, 2
    UNION ALL
    SELECT {id_col} AS doc, {DIM}::BIGINT AS idx, 1::BIGINT AS cnt
    FROM {table}
  ) f JOIN lab ON lab.doc = f.doc
)""",
        "ndocs AS (SELECT count(*)::DOUBLE AS n FROM lab)",
        f"w0 AS (SELECT unnest(range(0, {DIM + 1})) AS idx, 0.0 AS w)",
    ]
    for r in range(iters):
        parts.append(
            f"""z{r} AS MATERIALIZED (
  SELECT f.doc, f.label, round(sum(f.cnt * w.w), 6) AS z
  FROM feats f JOIN w{r} w USING (idx)
  GROUP BY 1, 2
)"""
        )
        parts.append(
            f"""p{r} AS (
  SELECT doc, label, round(1.0 / (1.0 + exp(-z)), 6) AS p FROM z{r}
)"""
        )
        parts.append(
            f"""g{r} AS (
  SELECT f.idx, round(sum((p.label - p.p) * f.cnt) / (SELECT n FROM ndocs), 6) AS g
  FROM feats f JOIN p{r} p ON p.doc = f.doc
  GROUP BY 1
)"""
        )
        parts.append(
            f"""w{r + 1} AS MATERIALIZED (
  SELECT w.idx, round(w.w + {lr!r} * coalesce(g.g, 0.0), 6) AS w
  FROM w{r} w LEFT JOIN g{r} g USING (idx)
)"""
        )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT f.doc, f.label,
       round(1.0 / (1.0 + exp(-round(sum(f.cnt * w.w), 6))), 6) AS prob,
       round(sum(f.cnt * w.w), 6) >= 0 AS pred
FROM feats f JOIN w{iters} w USING (idx)
GROUP BY 1, 2
"""
