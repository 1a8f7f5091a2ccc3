"""Time-series subsequence similarity search — z-normalized sliding
windows against a query pattern (the UCR-suite / matrix-profile family's
core primitive: "find where this SHAPE occurs, at any scale/offset").

Pipeline: per-key trailing window of the last ``m`` values (one
partitioned window pass, arrays built in-frame), z-normalize each
subsequence (amplitude/offset invariance — what makes this SHAPE search
rather than value search), squared Euclidean distance to the
z-normalized query pattern, global top-k by distance. Flat windows
(zero variance) carry no shape and are excluded — the standard UCR
convention.

Determinism discipline: the distance is round-6 before ranking and ties
break on (event_type, ts, id), so cross-engine double drift (~1e-15
from sum ordering inside aggregate lambdas) cannot reorder the top-k;
the z-normalized query is computed once driver-side from the literal
pattern and embedded in both plans as literals.

Scale shape: ONE partitioned window pass over the fact table (no
self-join — the naive form joins the series against itself m times),
map-side distance arithmetic, TakeOrderedAndProject for the top-k. At
100 TB the window pass shuffles once on the series key; skewed keys
salt like any other running-window computation (operators/running.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.functions.scalars import round6


def znorm_pattern(pattern: list[float]) -> list[float]:
    """Driver-side z-normalization of the literal query pattern (m is
    tiny — this is the tokenizer-artifact-sized piece both engines embed
    as literals)."""
    m = len(pattern)
    mean = sum(pattern) / m
    var = sum((x - mean) ** 2 for x in pattern) / m
    sd = math.sqrt(var)
    if sd == 0.0:
        raise ValueError("subseq: flat query pattern has no shape")
    return [(x - mean) / sd for x in pattern]


def subsequence_topk(
    events: DataFrame,
    pattern: list[float],
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    k: int = 20,
) -> DataFrame:
    """Top-k z-normalized matches of ``pattern`` across every per-key
    sliding window. Output: (event_type, ts_us, dist)."""
    q = znorm_pattern(pattern)
    m = len(q)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-(m - 1), 0)
    )
    sub = (
        events.select(key_col, ts_col, id_col, value_col)
        .withColumn("win", F.collect_list(value_col).over(w))
        .filter(F.size("win") == m)
    )
    mean = F.aggregate("win", F.lit(0.0), lambda a, x: a + x) / F.lit(float(m))
    sub = sub.withColumn("mu", mean)
    var = F.aggregate(
        "win", F.lit(0.0), lambda a, x: a + (x - F.col("mu")) * (x - F.col("mu"))
    ) / F.lit(float(m))
    sub = sub.withColumn("sd", F.sqrt(var)).filter(round6(F.col("sd")) > 0)
    qcol = F.array(*[F.lit(v) for v in q])
    diff = F.zip_with(
        "win", qcol, lambda x, qv: (x - F.col("mu")) / F.col("sd") - qv
    )
    dist = F.aggregate(diff, F.lit(0.0), lambda a, d: a + d * d)
    return (
        sub.withColumn("dist", round6(dist))
        .orderBy(F.asc("dist"), F.asc(key_col), F.asc(ts_col), F.asc(id_col))
        .limit(k)
        .select(
            key_col,
            F.unix_micros(F.col(ts_col)).alias("ts_us"),
            "dist",
        )
    )


def sql_subsequence_topk(
    pattern: list[float],
    *,
    trades_sql: str,
    k: int = 20,
) -> str:
    """DuckDB replay: the same window-array build (list() OVER a ROWS
    frame), the same z-norm/distance lattice, the same tie discipline.
    ``trades_sql`` must yield (event_type, ts, event_id, value)."""
    q = znorm_pattern(pattern)
    m = len(q)
    qlist = ", ".join(repr(v) for v in q)
    return f"""
WITH src AS ({trades_sql}),
sub AS (
  SELECT event_type, ts, event_id,
         list(value) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW
         ) AS win
  FROM src
),
full_wins AS (
  SELECT * FROM sub WHERE len(win) = {m}
),
stats AS (
  SELECT event_type, ts, event_id, win,
         list_reduce(list_prepend(0.0::DOUBLE, win), (a, x) -> a + x)
           / {float(m)} AS mu
  FROM full_wins
),
sdev AS (
  SELECT *, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(win, x -> (x - mu) * (x - mu))), (a, x) -> a + x)
             / {float(m)}) AS sd
  FROM stats
),
scored AS (
  SELECT event_type, ts, event_id,
         round(list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(range(1, {m} + 1),
             i -> ((win[i] - mu) / sd - ([{qlist}])[i])
                  * ((win[i] - mu) / sd - ([{qlist}])[i]))),
           (a, x) -> a + x), 6) AS dist
  FROM sdev WHERE round(sd, 6) > 0
)
SELECT event_type, epoch_us(ts) AS ts_us, dist
FROM scored
ORDER BY dist ASC, event_type ASC, ts ASC, event_id ASC
LIMIT {k}
"""


# Gaussian quartile breakpoints for a 4-symbol SAX alphabet (standard
# normal Φ⁻¹(0.25/0.5/0.75)) — public constants from the SAX papers,
# embedded as identical literals in both engines.
SAX_BREAKS = (-0.6744897501960817, 0.0, 0.6744897501960817)
SAX_ALPHABET = ("a", "b", "c", "d")


def sax_words(
    events: DataFrame,
    *,
    m: int = 8,
    segments: int = 4,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """SAX (Symbolic Aggregate approXimation) over every per-key sliding
    window: z-normalize, PAA-average into ``segments`` pieces, map each
    segment mean to a 4-symbol alphabet via the Gaussian quartile
    breakpoints. Output: (event_type, sax_word, n_windows) — the bucket
    histogram a symbol-indexed shape store is built on (windows with the
    same word are shape-similar candidates; lookups touch one bucket
    instead of the series). Flat windows are excluded as in
    :func:`subsequence_topk`; segment-mean decisions are round-6 so the
    DuckDB replay buckets identically."""
    if m % segments:
        raise ValueError("sax: m must divide into segments")
    per = m // segments
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col), F.col(id_col))
        .rowsBetween(-(m - 1), 0)
    )
    sub = (
        events.select(key_col, ts_col, id_col, value_col)
        .withColumn("win", F.collect_list(value_col).over(w))
        .filter(F.size("win") == m)
    )
    mean = F.aggregate("win", F.lit(0.0), lambda a, x: a + x) / F.lit(float(m))
    sub = sub.withColumn("mu", mean)
    var = F.aggregate(
        "win", F.lit(0.0), lambda a, x: a + (x - F.col("mu")) * (x - F.col("mu"))
    ) / F.lit(float(m))
    sub = sub.withColumn("sd", F.sqrt(var)).filter(round6(F.col("sd")) > 0)

    def seg_mean(k: int):
        s = F.lit(0.0)
        for j in range(per):
            s = s + F.element_at("win", k * per + j + 1)
        return round6(((s / F.lit(float(per))) - F.col("mu")) / F.col("sd"))

    def symbol(mcol):
        expr = F.lit(SAX_ALPHABET[-1])
        for b, sym in zip(reversed(SAX_BREAKS), reversed(SAX_ALPHABET[:-1])):
            expr = F.when(mcol < F.lit(b), F.lit(sym)).otherwise(expr)
        return expr

    word = F.concat(*[symbol(seg_mean(k)) for k in range(segments)])
    return (
        sub.withColumn("sax_word", word)
        .groupBy(key_col, "sax_word")
        .agg(F.count(F.lit(1)).alias("n_windows"))
    )


def sql_sax_words(*, trades_sql: str, m: int = 8, segments: int = 4) -> str:
    """DuckDB replay of :func:`sax_words`."""
    per = m // segments
    b1, b2, b3 = SAX_BREAKS

    def seg_mean(k: int) -> str:
        s = " + ".join(f"win[{k * per + j + 1}]" for j in range(per))
        return f"round((({s}) / {float(per)} - mu) / sd, 6)"

    def symbol(expr: str) -> str:
        return (
            f"CASE WHEN {expr} < ({b1!r}) THEN 'a' "
            f"WHEN {expr} < ({b2!r}) THEN 'b' "
            f"WHEN {expr} < ({b3!r}) THEN 'c' ELSE 'd' END"
        )

    word = " || ".join(symbol(seg_mean(k)) for k in range(segments))
    return f"""
WITH src AS ({trades_sql}),
sub AS (
  SELECT event_type, ts, event_id,
         list(value) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW
         ) AS win
  FROM src
),
full_wins AS (SELECT * FROM sub WHERE len(win) = {m}),
stats AS (
  SELECT *, list_reduce(list_prepend(0.0::DOUBLE, win), (a, x) -> a + x)
              / {float(m)} AS mu
  FROM full_wins
),
sdev AS (
  SELECT *, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(win, x -> (x - mu) * (x - mu))), (a, x) -> a + x)
             / {float(m)}) AS sd
  FROM stats
),
words AS (
  SELECT event_type, {word} AS sax_word
  FROM sdev WHERE round(sd, 6) > 0
)
SELECT event_type, sax_word, count(*) AS n_windows
FROM words GROUP BY 1, 2
"""


def motif_pairs(
    events: DataFrame,
    *,
    m: int = 8,
    segments: int = 4,
    k: int = 10,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Motif discovery — the top-k closest NON-OVERLAPPING window pairs
    per series, found the scalable way: candidate pairs come only from
    windows sharing a SAX bucket (the LSH-style pruning that avoids the
    all-pairs O(n²) matrix profile), then each candidate pair is
    verified with the exact z-normalized distance. Trivial matches
    (overlapping windows) are excluded by requiring the windows' series
    positions to differ by at least ``m`` — the UCR convention. Output:
    (event_type, sax_word, pos_a, pos_b, dist), global top-k by
    (dist, key, positions).

    Scale shape: the bucket self-join is keyed by (series, word) —
    bounded the way LSH band buckets are; a pathologically hot bucket
    (a series stuck in one shape) is capped the same way as hot LSH
    buckets (split on a secondary word or sample the bucket)."""
    if m % segments:
        raise ValueError("motif: m must divide into segments")
    per = m // segments
    wpos = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(id_col))
    w = wpos.rowsBetween(-(m - 1), 0)
    sub = (
        events.select(key_col, ts_col, id_col, value_col)
        .withColumn("pos", F.row_number().over(wpos))
        .withColumn("win", F.collect_list(value_col).over(w))
        .filter(F.size("win") == m)
    )
    mean = F.aggregate("win", F.lit(0.0), lambda a, x: a + x) / F.lit(float(m))
    sub = sub.withColumn("mu", mean)
    var = F.aggregate(
        "win", F.lit(0.0), lambda a, x: a + (x - F.col("mu")) * (x - F.col("mu"))
    ) / F.lit(float(m))
    sub = sub.withColumn("sd", F.sqrt(var)).filter(round6(F.col("sd")) > 0)

    def seg_mean(kk: int):
        s = F.lit(0.0)
        for j in range(per):
            s = s + F.element_at("win", kk * per + j + 1)
        return round6(((s / F.lit(float(per))) - F.col("mu")) / F.col("sd"))

    def symbol(mcol):
        expr = F.lit(SAX_ALPHABET[-1])
        for b, sym in zip(reversed(SAX_BREAKS), reversed(SAX_ALPHABET[:-1])):
            expr = F.when(mcol < F.lit(b), F.lit(sym)).otherwise(expr)
        return expr

    word = F.concat(*[symbol(seg_mean(kk)) for kk in range(segments)])
    tagged = sub.select(
        F.col(key_col).alias("key"),
        "pos",
        "win",
        "mu",
        "sd",
        word.alias("sax_word"),
    )
    a = tagged.alias("a")
    b = tagged.alias("b")
    pairs = a.join(
        b,
        (F.col("a.key") == F.col("b.key"))
        & (F.col("a.sax_word") == F.col("b.sax_word"))
        & (F.col("b.pos") - F.col("a.pos") >= m),
    )
    zdiff = F.zip_with(
        F.col("a.win"),
        F.col("b.win"),
        lambda x, y: (x - F.col("a.mu")) / F.col("a.sd")
        - (y - F.col("b.mu")) / F.col("b.sd"),
    )
    dist = round6(F.aggregate(zdiff, F.lit(0.0), lambda acc, d: acc + d * d))
    return (
        pairs.select(
            F.col("a.key").alias("event_type"),
            F.col("a.sax_word").alias("sax_word"),
            F.col("a.pos").alias("pos_a"),
            F.col("b.pos").alias("pos_b"),
            dist.alias("dist"),
        )
        .orderBy(
            F.asc("dist"),
            F.asc("event_type"),
            F.asc("pos_a"),
            F.asc("pos_b"),
        )
        .limit(k)
    )


def sql_motif_pairs(
    *, trades_sql: str, m: int = 8, segments: int = 4, k: int = 10
) -> str:
    """DuckDB replay of :func:`motif_pairs`."""
    per = m // segments
    b1, b2, b3 = SAX_BREAKS

    def seg_mean(kk: int) -> str:
        s = " + ".join(f"win[{kk * per + j + 1}]" for j in range(per))
        return f"round((({s}) / {float(per)} - mu) / sd, 6)"

    def symbol(expr: str) -> str:
        return (
            f"CASE WHEN {expr} < ({b1!r}) THEN 'a' "
            f"WHEN {expr} < ({b2!r}) THEN 'b' "
            f"WHEN {expr} < ({b3!r}) THEN 'c' ELSE 'd' END"
        )

    word = " || ".join(symbol(seg_mean(kk)) for kk in range(segments))
    return f"""
WITH src AS ({trades_sql}),
sub AS (
  SELECT event_type AS key,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id)
           AS pos,
         list(value) OVER (
           PARTITION BY event_type ORDER BY ts, event_id
           ROWS BETWEEN {m - 1} PRECEDING AND CURRENT ROW
         ) AS win
  FROM src
),
full_wins AS (SELECT * FROM sub WHERE len(win) = {m}),
stats AS (
  SELECT *, list_reduce(list_prepend(0.0::DOUBLE, win), (a, x) -> a + x)
              / {float(m)} AS mu
  FROM full_wins
),
sdev AS (
  SELECT *, sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(win, x -> (x - mu) * (x - mu))), (a, x) -> a + x)
             / {float(m)}) AS sd
  FROM stats
),
tagged AS (
  SELECT key, pos, win, mu, sd, {word} AS sax_word
  FROM sdev WHERE round(sd, 6) > 0
),
pairs AS (
  SELECT a.key AS event_type, a.sax_word AS sax_word,
         a.pos AS pos_a, b.pos AS pos_b,
         round(list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(range(1, {m} + 1),
             i -> ((a.win[i] - a.mu) / a.sd - (b.win[i] - b.mu) / b.sd)
                  * ((a.win[i] - a.mu) / a.sd - (b.win[i] - b.mu) / b.sd))),
           (acc, d) -> acc + d), 6) AS dist
  FROM tagged a JOIN tagged b
    ON a.key = b.key AND a.sax_word = b.sax_word AND b.pos - a.pos >= {m}
)
SELECT event_type, sax_word, pos_a, pos_b, dist
FROM pairs
ORDER BY dist ASC, event_type ASC, pos_a ASC, pos_b ASC
LIMIT {k}
"""
