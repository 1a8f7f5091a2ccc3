"""Market-analytics catalog queries over the trade-shaped ``events`` table.

The natural next tier above the reference's OHLC/cumulative-volume surface
(ProcessStockStream.py:143-161): VWAP bars, rolling inter-key correlation,
max drawdown, robust (median/MAD) outliers. Every query carries an exact
DuckDB oracle; the integer-moment discipline in operators/finance.py is
what makes the hashes portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import finance
from stock_streaming_data_pipeline_spark.plans.catalog import register
from stock_streaming_data_pipeline_spark.plans.stock import SQL_TRADES, trades_view

# DuckDB half-away integer snap (DuckDB round() is already half-away, but
# spelling it out keeps the rule identical to the Spark side's signum/floor).
_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"
_QMICRO = "CAST(round(volume * 1000000, 0) AS BIGINT)"


@register(
    "vwap_hourly",
    tags=("A1", "C1", "C8"),
    oracle=f"""
WITH trades AS ({SQL_TRADES}),
scaled AS (
  SELECT event_type AS key, date_trunc('hour', ts) AS bucket_ts,
         {_CENTS} AS p, {_QMICRO} AS q
  FROM trades WHERE value IS NOT NULL AND volume IS NOT NULL
),
agg AS (
  SELECT key, bucket_ts,
         sum(CAST(p * q AS DECIMAL(38,0))) AS s_pq,
         sum(CAST(q AS DECIMAL(38,0))) AS s_q,
         count(*) AS n_trades
  FROM scaled GROUP BY 1, 2
)
SELECT key, epoch(bucket_ts)::BIGINT AS bucket_s,
       round(s_pq::DOUBLE / s_q::DOUBLE / 100.0, 6) AS vwap,
       n_trades
FROM agg WHERE s_q > 0
""",
)
def vwap_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly VWAP per symbol — sum(price×qty)/sum(qty) with DECIMAL(38,0)
    inner products (exact at any scale; one partial-aggregated shuffle)."""
    return finance.vwap_bars(trades_view(spark, sf_dir))


@register(
    "rolling_corr_click_view",
    tags=("A1", "W2"),
    oracle=f"""
WITH trades AS ({SQL_TRADES}),
means AS (
  SELECT event_type AS key, date_trunc('hour', ts) AS bucket_ts,
         CAST(round(sum({_CENTS})::DOUBLE / count(*)::DOUBLE * 10, 0)
              AS BIGINT) AS mean_milli
  FROM trades WHERE value IS NOT NULL GROUP BY 1, 2
),
aligned AS (
  SELECT a.bucket_ts, a.mean_milli AS x, b.mean_milli AS y
  FROM means a JOIN means b USING (bucket_ts)
  WHERE a.key = 'click' AND b.key = 'view'
),
moments AS (
  SELECT bucket_ts,
         count(*) OVER w AS n,
         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         sum(x * y) OVER w AS sxy,
         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
  FROM aligned
  WINDOW w AS (ORDER BY bucket_ts ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT epoch(bucket_ts)::BIGINT AS bucket_s,
       round((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
             / sqrt((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
                    * (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)),
             6) AS corr
FROM moments WHERE n = 24
""",
)
def rolling_corr_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-bar Pearson correlation between the 'click' and 'view'
    hourly mean-price series. The milli-snapped integer grid makes every
    rolling moment an exact BIGINT sum — Spark's sliding frame and
    DuckDB's segment tree disagree on addition ORDER, which integer
    sums don't care about — so the correlation is hash-exact."""
    means = finance.hourly_means_milli(trades_view(spark, sf_dir))
    x = means.filter(F.col("key") == "click").select(
        "bucket_ts", F.col("mean_milli").alias("x_milli")
    )
    y = means.filter(F.col("key") == "view").select(
        "bucket_ts", F.col("mean_milli").alias("y_milli")
    )
    aligned = x.join(y, "bucket_ts")
    return finance.rolling_corr(aligned, frame=24)


@register(
    "max_drawdown_by_key",
    tags=("W1", "A5", "O2"),
    oracle=f"""
WITH trades AS ({SQL_TRADES}),
base AS (
  SELECT event_type AS key, ts, {_CENTS} AS cents
  FROM trades WHERE value IS NOT NULL
),
dd AS (
  SELECT key, ts, cents,
         max(cents) OVER (PARTITION BY key ORDER BY ts, cents
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS peak
  FROM base
),
scored AS (
  SELECT key, ts,
         round((peak - cents)::DOUBLE / peak::DOUBLE, 6) AS ddv
  FROM dd
),
per_key AS (SELECT key, max(ddv) AS max_drawdown FROM scored GROUP BY key)
SELECT s.key, p.max_drawdown, min(epoch_us(s.ts)) AS trough_us
FROM scored s JOIN per_key p ON s.key = p.key AND s.ddv = p.max_drawdown
GROUP BY s.key, p.max_drawdown
""",
)
def max_drawdown_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Max peak-to-trough drawdown per symbol (integer running peak, one
    double division per tick), with the earliest trough tick as the
    deterministic report row."""
    return finance.max_drawdown(trades_view(spark, sf_dir))


@register(
    "mad_robust_outliers",
    tags=("A5", "F1", "J2"),
    oracle="""
WITH ev AS (
  SELECT event_id AS id, event_type AS key, value AS x
  FROM events WHERE value IS NOT NULL
),
med AS (
  SELECT key, round(quantile_cont(x, 0.5), 6) AS med FROM ev GROUP BY key
),
dev AS (
  SELECT ev.id, ev.key, ev.x, med.med, abs(ev.x - med.med) AS adev
  FROM ev JOIN med USING (key)
),
mad AS (
  SELECT key, round(quantile_cont(adev, 0.5), 6) AS mad FROM dev GROUP BY key
  HAVING round(quantile_cont(adev, 0.5), 6) > 0
)
SELECT d.id, d.key, round(d.x, 6) AS x,
       round(0.6745 * (d.x - d.med) / m.mad, 6) AS robust_z
FROM dev d JOIN mad m USING (key)
WHERE abs(round(0.6745 * (d.x - d.med) / m.mad, 6)) > 3.5
""",
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD modified z-score outliers per key — the robust
    alternative to the z-score pass; two tiny per-key percentile aggs
    broadcast back, facts never shuffle."""
    return finance.mad_outliers(trades_view(spark, sf_dir))


@register(
    "rolling_corr_all_pairs",
    tags=("A1", "W2"),
    oracle=f"""
WITH trades AS ({SQL_TRADES}),
means AS (
  SELECT event_type AS key, date_trunc('hour', ts) AS bucket_ts,
         CAST(round(sum({_CENTS})::DOUBLE / count(*)::DOUBLE * 10, 0)
              AS BIGINT) AS mean_milli
  FROM trades WHERE value IS NOT NULL GROUP BY 1, 2
),
aligned AS (
  SELECT a.key || '|' || b.key AS pair, a.bucket_ts,
         a.mean_milli AS x, b.mean_milli AS y
  FROM means a JOIN means b USING (bucket_ts)
  WHERE a.key < b.key
),
moments AS (
  SELECT pair, bucket_ts,
         count(*) OVER w AS n,
         sum(x) OVER w AS sx, sum(y) OVER w AS sy,
         sum(x * y) OVER w AS sxy,
         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy
  FROM aligned
  WINDOW w AS (PARTITION BY pair ORDER BY bucket_ts
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT pair, epoch(bucket_ts)::BIGINT AS bucket_s,
       round((sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE / n::DOUBLE)
             / sqrt((sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)
                    * (syy::DOUBLE - sy::DOUBLE * sy::DOUBLE / n::DOUBLE)),
             6) AS corr
FROM moments WHERE n = 24
""",
)
def rolling_corr_all_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale form of rolling correlation: ALL symbol pairs at once,
    windows partitioned by pair id — the operator distributes across
    however many pairs exist (the pair count, not the grid length, is
    the scale dimension). Same exact-integer moment discipline as the
    single-pair query."""
    means = finance.hourly_means_milli(trades_view(spark, sf_dir))
    a = means.select(
        F.col("key").alias("key_a"), "bucket_ts", F.col("mean_milli").alias("x_milli")
    )
    b = means.select(
        F.col("key").alias("key_b"), "bucket_ts", F.col("mean_milli").alias("y_milli")
    )
    aligned = (
        a.join(b, "bucket_ts")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("pair", F.concat_ws("|", "key_a", "key_b"))
        .select("pair", "bucket_ts", "x_milli", "y_milli")
    )
    return finance.rolling_corr(aligned, frame=24, pair_col="pair")
