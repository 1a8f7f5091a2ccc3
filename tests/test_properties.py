"""Property-based tests (SURVEY §5.4) over hypothesis-generated trade data.

Invariants from the reference's semantics:
- cumulative volume is monotone non-decreasing per key (A3);
- window-sum conservation: tumbling window volumes sum to the total (A1);
- sliding-window event coverage: every event lands in exactly
  window/slide sliding windows (A2);
- as-of join: the matched right row is the true most-recent one (J1);
- OHLC bounds: low <= open/close <= high (A2/A5).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from stock_streaming_data_pipeline_spark.operators.asof import asof_join
from stock_streaming_data_pipeline_spark.operators.ohlc import sliding_bars, tumbling_volume
from stock_streaming_data_pipeline_spark.operators.running import running_sum

EPOCH = dt.datetime(2024, 1, 1)


@st.composite
def trades(draw, max_rows=60):
    n = draw(st.integers(min_value=1, max_value=max_rows))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.sampled_from(["A", "B"])),
                EPOCH + dt.timedelta(seconds=draw(st.integers(0, 600)), microseconds=i),
                draw(st.floats(0.01, 1000.0, allow_nan=False)),
                draw(st.floats(0.0001, 10.0, allow_nan=False)),
            )
        )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "symbol string, ts timestamp, price double, volume double"
    )


@given(rows=trades())
@settings(max_examples=12, deadline=None)
def test_cumulative_monotone_and_conserving(spark, rows):
    df = _df(spark, rows)
    out = running_sum(
        df, key="symbol", ts="ts", value="volume", out="cum", tiebreak=("price",)
    ).toPandas()
    for _, g in out.sort_values(["ts", "price"]).groupby("symbol"):
        assert g["cum"].is_monotonic_increasing
        assert abs(g["cum"].iloc[-1] - g["volume"].sum()) < 1e-9


@given(rows=trades())
@settings(max_examples=12, deadline=None)
def test_window_sum_conservation(spark, rows):
    df = _df(spark, rows)
    tv = tumbling_volume(df, key="symbol", ts="ts", volume="volume", window="1 minute")
    total_w = tv.agg(F.sum("total_volume")).collect()[0][0]
    total = df.agg(F.sum("volume")).collect()[0][0]
    assert abs(total_w - total) < 1e-9


@given(rows=trades(max_rows=40))
@settings(max_examples=10, deadline=None)
def test_sliding_coverage_and_bounds(spark, rows):
    df = _df(spark, rows)
    bars = sliding_bars(
        df, key="symbol", ts="ts", price="price",
        window="30 seconds", slide="10 seconds",
    ).toPandas()
    n_events = len(rows)
    assert bars["num_trades"].sum() == n_events * 3  # window/slide = 3
    assert (bars["low"] <= bars["high"]).all()
    assert ((bars["open"] >= bars["low"]) & (bars["open"] <= bars["high"])).all()
    assert ((bars["close"] >= bars["low"]) & (bars["close"] <= bars["high"])).all()


@given(rows=trades(max_rows=40))
@settings(max_examples=10, deadline=None)
def test_asof_matches_bruteforce(spark, rows):
    df = _df(spark, rows)
    left = df.filter(F.col("symbol") == "A").select("ts", F.lit("A").alias("symbol"), "price")
    right = df.filter(F.col("symbol") == "B").select(
        F.lit("A").alias("symbol"), "ts", "price"
    )
    got = asof_join(
        left, right, by="symbol", on="ts", right_values=["price"]
    ).toPandas()
    rp = right.toPandas().sort_values("ts")
    for _, row in got.iterrows():
        eligible = rp[rp["ts"] <= row["ts"]]
        if eligible.empty:
            assert pd.isna(row["asof_price"])
        else:
            assert row["asof_price"] == eligible.iloc[-1]["price"]


@given(rows=trades(max_rows=40))
@settings(max_examples=8, deadline=None)
def test_gapfill_invariants(spark, rows):
    """Gap fill: grid is dense per key; interpolated values lie within the
    surrounding observations; zero-filled counts only on absent slots."""
    from stock_streaming_data_pipeline_spark.operators.gapfill import gap_fill

    df = _df(spark, rows)
    minute = (
        df.withColumn("slot", (F.unix_micros("ts") / 60_000_000).cast("long"))
        .groupBy("symbol", "slot")
        .agg(F.count(F.lit(1)).alias("n"), F.avg("price").alias("p"))
    )
    filled = gap_fill(
        minute, key="symbol", slot="slot",
        interp_cols=["p"], zero_cols=["n"],
    ).toPandas()
    for _, g in filled.groupby("symbol"):
        slots = sorted(g["slot"])
        assert slots == list(range(min(slots), max(slots) + 1))  # dense
        assert (g["n"] >= 0).all()
        lo, hi = g["p"].min(), g["p"].max()
        assert g["p"].between(lo, hi).all() and g["p"].notna().all()


@given(trades())
@settings(max_examples=10, deadline=None)
def test_ewma_matches_sequential_reference(spark, rows):
    """operators/running.ewma == the textbook per-key float64 recursion,
    bitwise, regardless of input row order (the applyInPandas fold
    re-sorts within each key)."""
    from stock_streaming_data_pipeline_spark.operators.running import ewma

    df = _df(spark, rows).select(
        "symbol",
        (F.unix_micros(F.col("ts"))).alias("ts_us"),
        F.monotonically_increasing_id().alias("rid"),
        F.col("price"),
    )
    got = {
        (r["symbol"], r["rid"]): r["ewma_raw"]
        for r in ewma(
            df, key="symbol", order=("ts_us", "rid"), value_col="price"
        ).collect()
    }
    pdf = df.toPandas().sort_values(["symbol", "ts_us", "rid"])
    for sym, grp in pdf.groupby("symbol"):
        y = None
        for _, row in grp.iterrows():
            x = float(row["price"])
            y = x if y is None else 0.5 * x + 0.5 * y
            assert got[(sym, row["rid"])] == y  # bitwise


@st.composite
def priced_trades(draw, max_rows=50):
    n = draw(st.integers(min_value=2, max_value=max_rows))
    rows = []
    for i in range(n):
        rows.append(
            (
                draw(st.sampled_from(["aa", "bb"])),
                EPOCH + dt.timedelta(minutes=i),
                float(draw(st.integers(min_value=1, max_value=10_000))) / 10.0,
                float(draw(st.integers(min_value=0, max_value=100))),
            )
        )
    return rows


@settings(max_examples=15, deadline=None)
@given(priced_trades())
def test_max_drawdown_matches_brute_force(spark, rows):
    from stock_streaming_data_pipeline_spark.operators import finance

    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, volume double"
    )
    got = {
        r["key"]: r["max_drawdown"]
        for r in finance.max_drawdown(df).collect()
    }
    by_key: dict[str, list[float]] = {}
    for k, ts, v, _ in sorted(rows, key=lambda r: (r[0], r[1], round(r[2] * 100))):
        by_key.setdefault(k, []).append(round(v * 100))
    # Reference rounding must replicate Spark's round(double, 6): Java
    # BigDecimal.valueOf HALF_UPs the SHORTEST decimal repr of the double
    # (0.9996875 -> 0.999688), while Python's round() half-evens the
    # binary value (0.99968749999999994 -> 0.999687). Hypothesis found
    # the boundary: peak=64000, trough=20 cents.
    from decimal import ROUND_HALF_UP, Decimal

    def spark_round6(x: float) -> float:
        return float(
            Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
        )

    for k, cents in by_key.items():
        peak, best = cents[0], 0.0
        for c in cents:
            peak = max(peak, c)
            best = max(best, spark_round6((peak - c) / peak))
        assert got[k] == best


@settings(max_examples=15, deadline=None)
@given(priced_trades())
def test_vwap_mass_conservation(spark, rows):
    """sum(vwap_bucket * qty_bucket) == sum(price*qty) within rounding:
    the weighted mean must conserve notional per bucket."""
    from stock_streaming_data_pipeline_spark.operators import finance

    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, volume double"
    )
    out = finance.vwap_bars(df).collect()
    # recompute notional from returned vwap and trade count weights
    total_notional = sum(
        round(v * 100) * round(q * 1e6) for _, _, v, q in rows
    ) / (100 * 1e6)
    got_notional = 0.0
    qty_per = {}
    for k, ts, v, q in rows:
        b = (k, ts.replace(minute=0, second=0, microsecond=0))
        qty_per[b] = qty_per.get(b, 0) + round(q * 1e6) / 1e6
    for r in out:
        key = [b for b in qty_per if b[0] == r["key"]]
        # bucket_s identifies the hour
        import datetime as _dt

        bts = _dt.datetime.utcfromtimestamp(r["bucket_s"])
        got_notional += r["vwap"] * qty_per[(r["key"], bts)]
    assert abs(got_notional - total_notional) < 1e-2


@given(
    st.lists(
        st.integers(min_value=-25_000_000, max_value=25_000_000),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=50, deadline=None)
def test_sigmoid_micro_sql_fuzz_duckdb_matches_reference(z_micros):
    """Property fuzz over the frozen-exp-table sigmoid (the round-8
    quality_lr determinism core): for ANY micro-lattice logit — interior,
    saturated, negative, boundary-adjacent — the DuckDB rendering of
    sigmoid_micro_sql must equal the pure-Python evaluation of the same
    frozen tables (the Spark rendering is pinned on a literal vector in
    tests/test_llmdata.py; Spark-in-hypothesis would be too slow)."""
    import math

    import duckdb

    from stock_streaming_data_pipeline_spark.operators import lrquality as lrq

    def ref(zm: int) -> int:
        if zm >= lrq.SIG_SAT_MICRO:
            return 1_000_000
        if zm <= -lrq.SIG_SAT_MICRO:
            return 0
        am = abs(zm)
        eabs = (
            (lrq._EXP_1[am // 1_000_000] * lrq._EXP_2[(am // 10_000) % 100])
            * lrq._EXP_4[(am // 100) % 100]
        ) * lrq._EXP_6[am % 100]
        enegz = 1.0 / eabs if zm >= 0 else eabs
        return int(math.floor((1.0 / (1.0 + enegz)) * 1000000.0 + 0.5))

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(range(?))::BIGINT AS i, "
        "unnest(?::BIGINT[]) AS z",
        [len(z_micros), z_micros],
    )
    got = [
        r[0]
        for r in con.sql(
            f"SELECT {lrq.sigmoid_micro_sql('z', spark=False)} FROM t ORDER BY i"
        ).fetchall()
    ]
    want = [ref(z) for z in z_micros]
    assert got == want


@given(
    st.lists(
        st.integers(min_value=-(10**15), max_value=10**15),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=1, max_value=1000),
    st.integers(min_value=1, max_value=1000),
)
@settings(max_examples=50, deadline=None)
def test_half_up_div_sql_fuzz_duckdb_matches_reference(xs, num, den):
    """Property fuzz over the integer half-up rational scaler used by the
    LR gradient/update steps: DuckDB rendering == the arithmetic
    definition sign(x) * floor(|x|*num/den + 1/2) in exact rationals."""
    from fractions import Fraction

    import duckdb

    from stock_streaming_data_pipeline_spark.operators import lrquality as lrq

    def ref(x: int) -> int:
        mag_q = Fraction(abs(x) * num, den) + Fraction(1, 2)
        mag = mag_q.numerator // mag_q.denominator  # floor of the rational
        return -mag if x < 0 else mag

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT unnest(range(?))::BIGINT AS i, "
        "unnest(?::BIGINT[]) AS x",
        [len(xs), xs],
    )
    expr = lrq.half_up_div_sql("x", num, den, spark=False)
    got = [r[0] for r in con.sql(f"SELECT {expr} FROM t ORDER BY i").fetchall()]
    want = [ref(x) for x in xs]
    assert got == want
