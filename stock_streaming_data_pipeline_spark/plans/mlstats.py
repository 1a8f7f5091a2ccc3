"""Statistics / ML-adjacent analytics tier over the ``events`` stream.

Survival analysis (Kaplan-Meier), data-drift monitoring (PSI, two-sample
Kolmogorov-Smirnov), robust trend estimation, calibration — the model- and
experiment-monitoring queries a production pipeline runs beside its
training-data curation. All follow the catalog parity rules: exact integer
arithmetic (micro-units via ``floor(x*1e6+0.5)``) wherever the math allows,
epoch-microsecond BIGINTs for time, and identical IEEE-deterministic double
paths (only ``+ - * /``, ``sqrt``, and guarded ``ln``/``exp``) where a ratio
is genuinely irrational.

Scale notes are per-query; the common shape is: one pass over the fact
table into a bounded aggregated relation (users, etype x bin grid,
etype x distinct-value), then windows only over those bounded relations —
except the KS ECDF, which reuses the two-phase distributed prefix sum
(operators/running.py:running_sum_salted) so no single task ever owns a
whole event-type's value domain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators import running
from stock_streaming_data_pipeline_spark.plans.catalog import register
from stock_streaming_data_pipeline_spark.tables import load_table

_US_PER_DAY = 86_400_000_000  # epoch-microsecond day, exact integer


# ---------------------------------------------------------------------------
# Kaplan-Meier survival
# ---------------------------------------------------------------------------


@register(
    "survival_kaplan_meier",
    tags=("ML-stats",),
    oracle=f"""
WITH bounds AS (
  SELECT epoch_us(min(ts)) AS t0_us, epoch_us(max(ts)) AS t1_us FROM events
),
users AS (
  SELECT user_id, epoch_us(min(ts)) AS f_us,
         epoch_us(max(CASE WHEN event_type = 'purchase' THEN ts END)) AS l_us
  FROM events GROUP BY 1
  HAVING l_us IS NOT NULL
),
lives AS (
  SELECT
    CAST((f_us - t0_us) // (7 * {_US_PER_DAY}) AS BIGINT) AS cohort_week,
    CAST((l_us - f_us) // {_US_PER_DAY} AS BIGINT) AS t_days,
    (l_us >= t1_us - 7 * {_US_PER_DAY}) AS censored
  FROM users, bounds
),
grp AS (
  SELECT cohort_week, t_days,
         CAST(sum(CASE WHEN censored THEN 0 ELSE 1 END) AS BIGINT) AS d_events,
         CAST(sum(CASE WHEN censored THEN 1 ELSE 0 END) AS BIGINT) AS c_censored
  FROM lives GROUP BY 1, 2
),
risk AS (
  SELECT *,
         CAST(sum(d_events + c_censored) OVER (PARTITION BY cohort_week)
              - coalesce(sum(d_events + c_censored) OVER (
                  PARTITION BY cohort_week ORDER BY t_days
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS n_risk
  FROM grp
),
surv AS (
  SELECT *,
         max(CASE WHEN d_events > 0 AND d_events >= n_risk THEN 1 ELSE 0 END)
           OVER (PARTITION BY cohort_week ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hit_zero,
         sum(CASE WHEN d_events > 0 AND d_events < n_risk
                  THEN ln(CAST(n_risk - d_events AS DOUBLE) / n_risk)
                  ELSE 0.0 END)
           OVER (PARTITION BY cohort_week ORDER BY t_days
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS log_s
  FROM risk
)
SELECT cohort_week, t_days, n_risk, d_events, c_censored,
       CAST(CASE WHEN hit_zero = 1 THEN 0
                 ELSE floor(exp(log_s) * 1000000 + 0.5) END AS BIGINT)
         AS survival_micro
FROM surv
""",
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curves per signup cohort: each purchasing
    user's lifetime runs first event -> last purchase (whole days, exact
    epoch-microsecond integer arithmetic) — time-to-churn-from-buying;
    users whose last purchase falls in the final 7 days of the
    observation window are right-censored (still buying). Per
    cohort week the estimator steps through distinct lifetimes t with
    the at-risk count n_t (users surviving >= t), observed churns d_t
    and censorings c_t, and S(t) = prod_{t'<=t}(1 - d/n) — computed as
    exp of an ordered ln-sum (the only irrational step; both engines
    walk the identical ordered frame), snapped to micro-units, with the
    n==d absorbing-zero guarded by a windowed flag because DuckDB's
    ln(0) raises. Scale shape: one groupBy(user) pass over the fact
    table; everything after runs on the users relation and then the
    (cohort, lifetime-days) relation, bounded by the observation span —
    windows partition by cohort over day-granularity rows, never over
    SF-scaled data. The 1-row bounds frame rides a broadcast crossJoin."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.unix_micros(F.min("ts")).alias("t0_us"),
        F.unix_micros(F.max("ts")).alias("t1_us"),
    )
    users = (
        ev.groupBy("user_id")
        .agg(
            F.unix_micros(F.min("ts")).alias("f_us"),
            F.unix_micros(
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts")))
            ).alias("l_us"),
        )
        .filter(F.col("l_us").isNotNull())
    )
    lives = users.crossJoin(F.broadcast(bounds)).select(
        ((F.col("f_us") - F.col("t0_us")) / F.lit(7 * _US_PER_DAY))
        .cast("long")
        .alias("cohort_week"),
        ((F.col("l_us") - F.col("f_us")) / F.lit(_US_PER_DAY))
        .cast("long")
        .alias("t_days"),
        (F.col("l_us") >= F.col("t1_us") - F.lit(7 * _US_PER_DAY)).alias(
            "censored"
        ),
    )
    grp = lives.groupBy("cohort_week", "t_days").agg(
        F.sum(F.when(F.col("censored"), 0).otherwise(1)).alias("d_events"),
        F.sum(F.when(F.col("censored"), 1).otherwise(0)).alias("c_censored"),
    )
    w_all = Window.partitionBy("cohort_week")
    w_prev = (
        Window.partitionBy("cohort_week")
        .orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_le = (
        Window.partitionBy("cohort_week")
        .orderBy("t_days")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    removed = F.col("d_events") + F.col("c_censored")
    risk = grp.withColumn(
        "n_risk",
        F.sum(removed).over(w_all)
        - F.coalesce(F.sum(removed).over(w_prev), F.lit(0)),
    )
    surv = risk.withColumn(
        "hit_zero",
        F.max(
            F.when(
                (F.col("d_events") > 0) & (F.col("d_events") >= F.col("n_risk")),
                1,
            ).otherwise(0)
        ).over(w_le),
    ).withColumn(
        "log_s",
        F.sum(
            F.when(
                (F.col("d_events") > 0) & (F.col("d_events") < F.col("n_risk")),
                F.log(
                    (F.col("n_risk") - F.col("d_events")).cast("double")
                    / F.col("n_risk")
                ),
            ).otherwise(F.lit(0.0))
        ).over(w_le),
    )
    return surv.select(
        "cohort_week",
        "t_days",
        "n_risk",
        "d_events",
        "c_censored",
        F.when(F.col("hit_zero") == 1, F.lit(0))
        .otherwise(F.floor(F.exp("log_s") * 1_000_000 + F.lit(0.5)))
        .cast("long")
        .alias("survival_micro"),
    )


# ---------------------------------------------------------------------------
# Population Stability Index drift report
# ---------------------------------------------------------------------------

_PSI_BINS = 10
_PSI_SPLIT_DAYS = 15  # epoch A = first 15 days, epoch B = the rest


@register(
    "drift_psi_report",
    tags=("ML-stats",),
    oracle=f"""
WITH bounds AS (
  SELECT epoch_us(min(ts)) AS t0_us,
         min(value) AS vmin, max(value) AS vmax
  FROM events
),
binned AS (
  SELECT event_type,
         CASE WHEN vmax = vmin THEN 0
              ELSE least({_PSI_BINS - 1},
                         CAST(floor((value - vmin) * {_PSI_BINS}
                                    / (vmax - vmin)) AS INTEGER))
         END AS bin,
         (epoch_us(ts) < t0_us + {_PSI_SPLIT_DAYS} * {_US_PER_DAY}) AS in_a
  FROM events, bounds
),
grid AS (
  SELECT event_type, CAST(r.range AS INTEGER) AS bin
  FROM (SELECT DISTINCT event_type FROM events), range({_PSI_BINS}) r
),
counts AS (
  SELECT g.event_type, g.bin,
         CAST(coalesce(sum(CASE WHEN b.in_a THEN 1 END), 0) AS BIGINT) AS c_a,
         CAST(coalesce(sum(CASE WHEN NOT b.in_a THEN 1 END), 0) AS BIGINT) AS c_b
  FROM grid g LEFT JOIN binned b
    ON b.event_type = g.event_type AND b.bin = g.bin
  GROUP BY 1, 2
),
probs AS (
  SELECT *,
         sum(c_a) OVER (PARTITION BY event_type) AS n_a,
         sum(c_b) OVER (PARTITION BY event_type) AS n_b
  FROM counts
),
contribs AS (
  SELECT event_type, bin, c_a, c_b,
         CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         (CAST(c_a + 1 AS DOUBLE) / (n_a + {_PSI_BINS})
          - CAST(c_b + 1 AS DOUBLE) / (n_b + {_PSI_BINS}))
         * ln((CAST(c_a + 1 AS DOUBLE) / (n_a + {_PSI_BINS}))
              / (CAST(c_b + 1 AS DOUBLE) / (n_b + {_PSI_BINS}))) AS contrib
  FROM probs
)
SELECT event_type, bin, c_a, c_b,
       CAST(floor(contrib * 1000000 + 0.5) AS BIGINT) AS contrib_micro,
       CAST(floor(sum(contrib) OVER (PARTITION BY event_type) * 1000000 + 0.5)
         AS BIGINT) AS psi_micro
FROM contribs
""",
)
def drift_psi_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor: split the stream into
    epoch A (first 15 days) and epoch B (the rest), histogram ``value``
    into 10 equal-width bins over the GLOBAL range per event type, and
    score PSI = sum (pA - pB) * ln(pA / pB) with Laplace-smoothed bin
    probabilities (so empty bins contribute finitely and DuckDB's
    ln-of-zero never fires). The industry drift gate is psi > 0.2; the
    report emits per-bin contributions plus the per-type total, both in
    micro-units. Bin assignment uses only IEEE-exact ops (- * / floor),
    so both engines bin identically. Scale shape: ONE pass over the
    fact table into an etype x 10-bin grid (the grid is a distinct-etype
    relation crossed with a 10-row literal range — broadcast both ways);
    every window thereafter partitions over that bounded grid. The
    1-row bounds frame rides a broadcast crossJoin."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.unix_micros(F.min("ts")).alias("t0_us"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    binned = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.when(F.col("vmax") == F.col("vmin"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(_PSI_BINS - 1),
                F.floor(
                    (F.col("value") - F.col("vmin"))
                    * _PSI_BINS
                    / (F.col("vmax") - F.col("vmin"))
                ).cast("int"),
            )
        )
        .alias("bin"),
        (
            F.unix_micros("ts")
            < F.col("t0_us") + F.lit(_PSI_SPLIT_DAYS * _US_PER_DAY)
        ).alias("in_a"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                spark.range(_PSI_BINS).select(F.col("id").cast("int").alias("bin"))
            )
        )
    )
    counts = (
        grid.join(binned, ["event_type", "bin"], "left")
        .groupBy("event_type", "bin")
        .agg(
            F.coalesce(F.sum(F.when(F.col("in_a"), 1)), F.lit(0)).alias("c_a"),
            F.coalesce(F.sum(F.when(~F.col("in_a"), 1)), F.lit(0)).alias("c_b"),
        )
    )
    w_et = Window.partitionBy("event_type")
    probs = counts.withColumn("n_a", F.sum("c_a").over(w_et)).withColumn(
        "n_b", F.sum("c_b").over(w_et)
    )
    p_a = (F.col("c_a") + 1).cast("double") / (F.col("n_a") + _PSI_BINS)
    p_b = (F.col("c_b") + 1).cast("double") / (F.col("n_b") + _PSI_BINS)
    contribs = probs.withColumn("contrib", (p_a - p_b) * F.log(p_a / p_b))
    return contribs.select(
        "event_type",
        "bin",
        "c_a",
        "c_b",
        F.floor(F.col("contrib") * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("contrib_micro"),
        F.floor(F.sum("contrib").over(w_et) * 1_000_000 + F.lit(0.5))
        .cast("long")
        .alias("psi_micro"),
    )


# ---------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test
# ---------------------------------------------------------------------------


@register(
    "drift_ks_two_sample",
    tags=("ML-stats",),
    oracle=f"""
WITH bounds AS (
  SELECT epoch_us(min(ts)) AS t0_us FROM events
),
tagged AS (
  SELECT event_type, value,
         (epoch_us(ts) < t0_us + {_PSI_SPLIT_DAYS} * {_US_PER_DAY}) AS in_a
  FROM events, bounds
),
pts AS (
  SELECT event_type, value,
         CAST(coalesce(sum(CASE WHEN in_a THEN 1 END), 0) AS BIGINT) AS ca,
         CAST(coalesce(sum(CASE WHEN NOT in_a THEN 1 END), 0) AS BIGINT) AS cb
  FROM tagged GROUP BY 1, 2
),
ecdf AS (
  SELECT event_type,
         sum(ca) OVER (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ca_le,
         sum(cb) OVER (PARTITION BY event_type ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cb_le,
         sum(ca) OVER (PARTITION BY event_type) AS n_a,
         sum(cb) OVER (PARTITION BY event_type) AS n_b
  FROM pts
)
SELECT event_type,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST((max(abs(ca_le * n_b - cb_le * n_a)) * 2000000 + n_a * n_b)
            // (2 * n_a * n_b) AS BIGINT) AS ks_micro,
       max(abs(ca_le * n_b - cb_le * n_a)) / (CAST(n_a AS DOUBLE) * n_b)
         > 1.358 * sqrt(CAST(n_a + n_b AS DOUBLE) / (n_a * n_b)) AS reject_05
FROM ecdf
GROUP BY 1, n_a, n_b
""",
)
def drift_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test per event type: D =
    max_v |ECDF_A(v) - ECDF_B(v)| between epoch A (first 15 days) and
    epoch B, with the large-sample 5% rejection rule D > 1.358 *
    sqrt((nA+nB)/(nA*nB)). The supremum runs on EXACT integers —
    |ca_le*nB - cb_le*nA| over the distinct-value grid — so the
    statistic is a half-away-rounded micro-unit with no float in the
    max; the critical-value compare uses only IEEE-exact ops (/ * sqrt),
    identical cross-engine. Scale shape: one groupBy pass collapses the
    fact table to (etype, distinct value) counts; the ECDF prefix sums
    then run through the two-phase distributed prefix sum
    (running_sum_salted, segmented by value/50 buckets) so no single
    task ever owns an event-type's whole value domain — the plain
    per-key ordered window would serialize a hot etype at 100 TB. The
    BIGINT cross-products stay in range up to ~3e9 rows per etype; past
    that, lift ks_micro into DECIMAL(38,0)."""
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.agg(F.unix_micros(F.min("ts")).alias("t0_us"))
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "value",
        (
            F.unix_micros("ts")
            < F.col("t0_us") + F.lit(_PSI_SPLIT_DAYS * _US_PER_DAY)
        ).alias("in_a"),
    )
    pts = tagged.groupBy("event_type", "value").agg(
        F.coalesce(F.sum(F.when(F.col("in_a"), 1)), F.lit(0)).alias("ca"),
        F.coalesce(F.sum(F.when(~F.col("in_a"), 1)), F.lit(0)).alias("cb"),
    )
    seg = F.floor(F.col("value") / F.lit(50.0))
    cum_a = running.running_sum_salted(
        pts, key="event_type", ts="value", value="ca", out="ca_le", segment=seg
    )
    ecdf = running.running_sum_salted(
        cum_a, key="event_type", ts="value", value="cb", out="cb_le", segment=seg
    )
    totals = pts.groupBy("event_type").agg(
        F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b")
    )
    joined = ecdf.join(totals, "event_type")
    diff = F.abs(
        F.col("ca_le") * F.col("n_b") - F.col("cb_le") * F.col("n_a")
    )
    agg = joined.groupBy("event_type", "n_a", "n_b").agg(
        F.max(diff).alias("max_diff")
    )
    den = F.col("n_a") * F.col("n_b")
    return agg.select(
        "event_type",
        "n_a",
        "n_b",
        F.expr("(max_diff * 2000000 + n_a * n_b) DIV (2 * n_a * n_b)").alias(
            "ks_micro"
        ),
        (
            F.col("max_diff") / (F.col("n_a").cast("double") * F.col("n_b"))
            > F.lit(1.358)
            * F.sqrt((F.col("n_a") + F.col("n_b")).cast("double") / den)
        ).alias("reject_05"),
    )
