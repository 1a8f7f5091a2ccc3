"""Operator-level pins for the round-11 modules.

Standing rule (r10 verdict): every shared-implementation or
engine-specific algorithm gets an operator-level brute-force or property
witness, independent of the catalog differential.
"""

from __future__ import annotations

import random

from stock_streaming_data_pipeline_spark.operators.substring import (
    lcs_length,
    lcs_length_gramsets,
)


def _brute_lcs(a: str, b: str) -> int:
    """O(n^2 m) reference: every substring of a, longest first."""
    best = 0
    for i in range(len(a)):
        for j in range(i + best + 1, len(a) + 1):
            if a[i:j] in b:
                best = j - i
            else:
                break
    return best


def test_suffix_automaton_lcs_vs_brute_force():
    rng = random.Random(1111)
    for _ in range(300):
        # small alphabet forces repeats, clones, and long shared runs
        a = "".join(rng.choice("abc") for _ in range(rng.randint(0, 60)))
        b = "".join(rng.choice("abc") for _ in range(rng.randint(0, 60)))
        want = _brute_lcs(a, b)
        assert lcs_length(a, b) == want, (a, b)
        got_gs = lcs_length_gramsets(a, b, lo=1)
        # gramsets returns 0 when even lo=1 fails (disjoint alphabets)
        assert got_gs == want or (got_gs == 0 and want == 0), (a, b)


def test_suffix_automaton_lcs_edges():
    assert lcs_length("", "anything") == 0
    assert lcs_length("anything", "") == 0
    assert lcs_length("abc", "xbcy") == 2
    assert lcs_length("abcabc", "abcabc") == 6
    # planted-filler shape: periodic strings, different periods
    assert lcs_length("blk4 " * 20, "blk45 " * 20) >= 4
    assert lcs_length("blk4 " * 20, "blk4 " * 20) == 100


# ---------------------------------------------------------------------------
# t-digest: independent witnesses (the catalog oracle shares the
# implementation, so these pin the estimator itself)
# ---------------------------------------------------------------------------


def _tdigest_two_level(vals, *, shards, delta):
    from stock_streaming_data_pipeline_spark.operators import tdigest

    groups = {}
    for i, v in enumerate(vals):
        groups.setdefault(i % shards, []).append(v)
    merged = []
    for g in groups.values():
        merged.extend(tdigest.digest_values(g, delta=delta))
    return tdigest.compress(merged, delta=delta)


def test_tdigest_mass_preservation_and_rank_error():
    from stock_streaming_data_pipeline_spark.operators import tdigest

    rng = random.Random(1106)
    datasets = [
        [rng.randint(0, 10_000) for _ in range(5000)],          # uniform
        [int(1000 / (rng.random() + 0.01)) for _ in range(5000)],  # heavy tail
        [7] * 3000 + [rng.randint(0, 100) for _ in range(2000)],  # massive tie
        [rng.randint(0, 5) for _ in range(97)],                  # tiny
    ]
    delta = 100
    for vals in datasets:
        n = len(vals)
        sv = sorted(vals)
        for shards in (1, 4, 32):
            d = _tdigest_two_level(vals, shards=shards, delta=delta)
            # exact mass preservation: integer sums/weights
            assert sum(w for _, w in d) == n
            assert sum(s for s, _ in d) == sum(vals)
            for q in (0.01, 0.25, 0.5, 0.75, 0.99):
                est = tdigest.quantile(d, q=q, v_min=sv[0], v_max=sv[-1])
                # with ties the rank of est is an INTERVAL; error is the
                # distance from q*n to that interval
                import bisect
                lo = bisect.bisect_left(sv, est)
                hi = bisect.bisect_right(sv, est)
                err = 0.0 if lo <= q * n <= hi else min(
                    abs(q * n - lo), abs(q * n - hi)
                )
                assert err <= 6 * n / delta + 4, (q, shards, lo, hi, q * n)


def test_tdigest_input_order_independence():
    from stock_streaming_data_pipeline_spark.operators import tdigest

    rng = random.Random(1107)
    vals = [rng.randint(0, 1000) for _ in range(2000)]
    groups = {}
    for i, v in enumerate(vals):
        groups.setdefault(i % 8, []).append(v)
    def final(order):
        merged = []
        for k in order:
            merged.extend(tdigest.digest_values(groups[k], delta=100))
        return tdigest.compress(merged, delta=100)
    base = final(sorted(groups))
    assert final(list(reversed(sorted(groups)))) == base
    ks = sorted(groups); rng.shuffle(ks)
    assert final(ks) == base


# ---------------------------------------------------------------------------
# Huber IRLS: independent witnesses
# ---------------------------------------------------------------------------


def test_huber_equals_ols_on_clean_data():
    """With every residual inside delta the Huber weights are all 1, so
    IRLS must reproduce the OLS solution EXACTLY (integer-for-integer)."""
    from stock_streaming_data_pipeline_spark.operators.robust import (
        MICRO, huber_irls, solve_wls,
    )

    rng = random.Random(1108)
    xy = [(x, 300 * x + 50 + rng.randint(-20, 20)) for x in
          [rng.randint(1, 50) for _ in range(500)]]
    n = len(xy)
    ols = solve_wls(
        n * MICRO,
        sum(x for x, _ in xy) * MICRO,
        sum(y for _, y in xy) * MICRO,
        sum(x * x for x, _ in xy) * MICRO,
        sum(x * y for x, y in xy) * MICRO,
    )
    a, b, n_rows, n_down = huber_irls(
        xy, delta_micro=10_000 * MICRO, iters=6
    )
    assert (a, b) == ols and n_down == 0 and n_rows == n


def test_huber_resists_gross_outliers():
    """Planted 100x outliers drag OLS far more than Huber; the Huber
    slope must stay within 5% of the clean-data slope while OLS moves
    by much more."""
    from stock_streaming_data_pipeline_spark.operators.robust import (
        MICRO, huber_irls, solve_wls,
    )

    rng = random.Random(1109)
    clean = [(x, 300 * x + rng.randint(-30, 30)) for x in
             [rng.randint(1, 50) for _ in range(2000)]]
    dirty = [
        (x, y * 100 if i % 97 == 0 else y) for i, (x, y) in enumerate(clean)
    ]
    def ols_slope(xy):
        n = len(xy)
        return solve_wls(
            n * MICRO,
            sum(x for x, _ in xy) * MICRO,
            sum(y for _, y in xy) * MICRO,
            sum(x * x for x, _ in xy) * MICRO,
            sum(x * y for x, y in xy) * MICRO,
        )[1]
    b_clean = ols_slope(clean)
    b_ols_dirty = ols_slope(dirty)
    _, b_hub, _, n_down = huber_irls(dirty, delta_micro=100 * MICRO, iters=6)
    assert n_down > 0
    assert abs(b_hub - b_clean) < 0.05 * abs(b_clean)
    assert abs(b_ols_dirty - b_clean) > 4 * abs(b_hub - b_clean)


def test_huber_irls_fixed_point_stationarity():
    """At the returned state, one MORE reweighted pass must (near-)fix
    the estimate: the weighted normal equations recomputed AT (a, b)
    return (a, b) again within 1 micro — the M-estimator stationarity
    check, independent of the iteration count chosen."""
    from stock_streaming_data_pipeline_spark.operators.robust import (
        MICRO, huber_irls, solve_wls, weight_micro,
    )

    rng = random.Random(1110)
    xy = [
        (x, 250 * x + rng.randint(-500, 500) * (10 if x % 13 == 0 else 1))
        for x in [rng.randint(1, 50) for _ in range(3000)]
    ]
    delta = 800 * MICRO
    a, b, _, _ = huber_irls(xy, delta_micro=delta, iters=40)
    sw = swx = swy = swxx = swxy = 0
    for x, y in xy:
        w = weight_micro(y * MICRO - a - b * x, delta)
        sw += w; swx += w * x; swy += w * y
        swxx += w * x * x; swxy += w * x * y
    a2, b2 = solve_wls(sw, swx, swy, swxx, swxy)
    assert abs(a2 - a) <= 1 and abs(b2 - b) <= 1, (a, b, a2, b2)


# ---------------------------------------------------------------------------
# Hungarian assignment: exhaustive witness
# ---------------------------------------------------------------------------


def test_hungarian_vs_brute_force_random_matrices():
    from stock_streaming_data_pipeline_spark.operators.assignment import (
        brute_force_assignment,
        min_cost_assignment,
    )

    rng = random.Random(1112)
    for _ in range(200):
        n = rng.randint(1, 6)
        m = rng.randint(n, 8)
        cost = [[rng.randint(0, 50) for _ in range(m)] for _ in range(n)]
        assert min_cost_assignment(cost) == brute_force_assignment(cost), cost
    # degenerate: empty, single cell, all-equal costs (maximal ties)
    assert min_cost_assignment([]) == 0
    assert min_cost_assignment([[7]]) == 7
    tie = [[5] * 4 for _ in range(4)]
    assert min_cost_assignment(tie) == 20


# ---------------------------------------------------------------------------
# Borůvka MST: three-algorithm witness (Spark Borůvka vs Kruskal vs Prim)
# ---------------------------------------------------------------------------


def test_boruvka_vs_kruskal_vs_prim_random_graphs(spark):
    """The catalog oracle re-derives the forest with Kruskal; this pin
    adds a THIRD algorithm (Prim) and runs the distributed Borůvka on
    random graphs, so a bug shared by any two derivations still trips.
    Weights are drawn unique-free (duplicates allowed) — the (w, u, v)
    total order must still yield one agreed forest weight."""
    from stock_streaming_data_pipeline_spark.operators.mst import (
        boruvka_mst,
        kruskal_components,
        prim_total_weight,
    )

    rng = random.Random(1113)
    for trial in range(6):
        n = rng.randint(5, 24)
        # random multigraph-free edge set, possibly disconnected
        all_pairs = [(u, v) for u in range(n) for v in range(u + 1, n)]
        m = rng.randint(n // 2, min(len(all_pairs), 3 * n))
        pairs = rng.sample(all_pairs, m)
        rows = [(u, v, rng.randint(1, 9)) for u, v in pairs]
        expected = kruskal_components(rows)
        exp_total = sum(tw for _, tw in expected.values())
        assert prim_total_weight(rows) == exp_total, (trial, rows)

        edges = spark.createDataFrame(rows, "u long, v long, w long")
        forest, labels = boruvka_mst(edges)
        got = {
            (r["u"], r["v"]): r["w"] for r in forest.collect()
        }
        lab = {r["node"]: r["component"] for r in labels.collect()}
        # forest totals per component must equal the Kruskal witness
        got_comp: dict[int, list[int]] = {}
        for (u, v), w in got.items():
            assert lab[u] == lab[v], (trial, u, v)
            got_comp.setdefault(lab[u], []).append(w)
        got_summary = {
            c: (sum(1 for x in lab.values() if x == c) , sum(ws))
            for c, ws in got_comp.items()
        }
        # singleton components (no edges) appear in labels only
        for c, (sz, tw) in expected.items():
            if sz == 1:
                assert lab[c] == c
            else:
                assert got_summary[c] == (sz, tw), (trial, c)
        # total forest weight agrees with all three algorithms
        assert sum(got.values()) == exp_total, (trial,)
        # labels are exactly the min node id of each tree
        comp_members: dict[int, list[int]] = {}
        for node, c in lab.items():
            comp_members.setdefault(c, []).append(node)
        for c, members in comp_members.items():
            assert c == min(members), (trial, c, members)


# ---------------------------------------------------------------------------
# Skyline: brute-force dominance witness
# ---------------------------------------------------------------------------


def test_skyline_vs_brute_force(spark):
    from stock_streaming_data_pipeline_spark.operators.skyline import (
        brute_force_skyline,
        skyline_2d,
    )

    rng = random.Random(1114)
    for trial in range(5):
        n = rng.randint(1, 60)
        pts = [
            (rng.randint(0, 20), rng.randint(0, 20)) for _ in range(n)
        ]
        df = spark.createDataFrame(
            [(i, x, y) for i, (x, y) in enumerate(pts)], "id long, x long, y long"
        )
        got = sorted(
            (r["x"], r["y"])
            for r in skyline_2d(df, min_col="x", max_col="y").collect()
        )
        exp = sorted(brute_force_skyline(pts))
        assert got == exp, (trial, pts)


# ---------------------------------------------------------------------------
# Interval union: brute-force day-set witness for the island formulation
# ---------------------------------------------------------------------------


def test_interval_union_islands_vs_day_sets(spark):
    """The catalog query's window-algebra island merge must equal a
    literal day-set union on random interval families (inclusive
    endpoints), including duplicate and nested intervals."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rng = random.Random(1115)
    fams = []
    for key in range(12):
        n = rng.randint(1, 10)
        for i in range(n):
            s = rng.randint(0, 40)
            e = s + rng.randint(0, 8)
            fams.append((key, i, s, e))
    df = spark.createDataFrame(fams, "k long, oid long, s long, e long")

    w_prev = (
        Window.partitionBy("k").orderBy("s", "e", "oid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("k").orderBy("s", "e", "oid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_max = F.max("e").over(w_prev)
    isl = df.select(
        "k", "s", "e",
        F.sum(
            F.when(prev_max.isNull() | (F.col("s") > prev_max), 1).otherwise(0)
        ).over(w_run).alias("island"),
    )
    got = {
        r["k"]: r["cov"]
        for r in isl.groupBy("k", "island")
        .agg(F.min("s").alias("a"), F.max("e").alias("b"))
        .groupBy("k")
        .agg(F.sum(F.col("b") - F.col("a") + 1).alias("cov"))
        .collect()
    }
    exp: dict[int, set[int]] = {}
    for k, _oid, s, e in fams:
        exp.setdefault(k, set()).update(range(s, e + 1))
    for k, days in exp.items():
        assert got[k] == len(days), (k, sorted(days), got[k])


# ---------------------------------------------------------------------------
# truncate_lineage: correctness of the hard checkpoint
# ---------------------------------------------------------------------------


def test_truncate_lineage_preserves_rows_and_schema(spark):
    """The bare-LogicalRDD re-wrap must preserve rows exactly (the raw
    toRdd iterator reuses UnsafeRow buffers — a naive wrap aliases every
    row in a partition to the last one; the helper routes through
    Dataset.localCheckpoint's per-row copy), for both eager modes and
    through a chain of self-joins."""
    from pyspark.sql import functions as F

    from stock_streaming_data_pipeline_spark.operators.checkpoint import (
        truncate_lineage,
    )

    base = spark.range(100).select(
        F.col("id"), (F.col("id") * 3 % 7).alias("k"), F.sha1(F.col("id").cast("string")).alias("s")
    )
    expect = sorted(tuple(r) for r in base.collect())
    for eager in (True, False):
        got = sorted(tuple(r) for r in truncate_lineage(base, eager=eager).collect())
        assert got == expect, eager
    # chain of self-joins over truncated frames stays correct
    df = truncate_lineage(
        spark.range(30).select(F.col("id").alias("comp"), (F.col("id") + 1).alias("lab"))
    )
    for _ in range(25):
        hop = df.select(F.col("comp").alias("c2"), F.col("lab").alias("l2"))
        df = truncate_lineage(
            df.join(hop, df.lab == hop.c2, "left").select(
                "comp", F.coalesce(F.col("l2"), F.col("lab")).alias("lab")
            )
        )
    rows = {r["comp"]: r["lab"] for r in df.collect()}
    assert len(rows) == 30 and all(v == 30 for v in rows.values()), rows


# ---------------------------------------------------------------------------
# Change-point: Fraction-exact SSE brute force vs the rational-argmax rule
# ---------------------------------------------------------------------------


def test_changepoint_rational_argmax_vs_fraction_sse():
    """argmax_k of G(k) = s1^2/n1 + s2^2/n2 under exact-rational compare
    (cross-multiplied, ties to earliest k) must pick the same split as
    Fraction-exact SSE minimization (ties to earliest k) on random
    integer series — pins the algebra the catalog query relies on, plus
    the BIGINT headroom bound for the cross products."""
    from fractions import Fraction

    rng = random.Random(1116)
    for trial in range(300):
        n = rng.randint(2, 31)
        xs = [rng.randint(0, 1000) for _ in range(n)]
        tot = sum(xs)
        sumsq = sum(x * x for x in xs)
        # Fraction-exact SSE argmin
        best_sse, best_k_sse = None, None
        for k in range(1, n):
            s1 = sum(xs[:k])
            sse = (
                Fraction(sumsq)
                - Fraction(s1 * s1, k)
                - Fraction((tot - s1) * (tot - s1), n - k)
            )
            if best_sse is None or sse < best_sse:
                best_sse, best_k_sse = sse, k
        # rational-argmax of G via cross-multiplied dominance
        cands = []
        for k in range(1, n):
            s1 = sum(xs[:k])
            g_num = s1 * s1 * (n - k) + (tot - s1) * (tot - s1) * k
            g_den = k * (n - k)
            cands.append((k, g_num, g_den))
        win = [
            (k, gn, gd)
            for k, gn, gd in cands
            if not any(
                gn2 * gd > gn * gd2 or (gn2 * gd == gn * gd2 and k2 < k)
                for k2, gn2, gd2 in cands
            )
        ]
        assert len(win) == 1, (trial, win)
        assert win[0][0] == best_k_sse, (trial, xs, win, best_k_sse)
        # headroom: the dominance cross-product is bounded by
        # s^2 * n^3 / 4; on a 31-day span int64 holds up to s ~ 3.5e7
        # events/type (sf10 is ~4e6/type, 8x margin)
        s_cap, n_cap = 3 * 10**7, 31
        assert (s_cap * s_cap * n_cap) * (n_cap * n_cap // 4) < 2**63


# ---------------------------------------------------------------------------
# Greedy max-coverage: Spark join-algebra trace vs pure-Python set trace
# ---------------------------------------------------------------------------


def test_greedy_max_coverage_spark_vs_python(spark):
    from stock_streaming_data_pipeline_spark.operators.coverage import (
        greedy_max_coverage,
        greedy_max_coverage_py,
    )

    rng = random.Random(1117)
    for trial in range(4):
        n_docs = rng.randint(3, 15)
        vocab = [f"w{i}" for i in range(rng.randint(4, 25))]
        sets = {
            d: set(rng.sample(vocab, rng.randint(1, len(vocab))))
            for d in range(n_docs)
        }
        rows = [(d, t) for d, toks in sets.items() for t in toks]
        df = spark.createDataFrame(rows, "doc long, tok string")
        got = greedy_max_coverage(df, id_col="doc", tok_col="tok", k=5)
        exp = greedy_max_coverage_py(sets, k=5)
        assert got == exp, (trial, sets, got, exp)
