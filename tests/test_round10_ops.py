"""Unit pins for the round-10 operator modules.

The catalog differential already checks end-to-end results; these pin
the operator-level invariants the differential can't see (the automaton
vs the stdlib's non-overlapping count on arbitrary text, the bordered-
pattern refusal, PAVA's monotonicity/mass-preservation).
"""

from __future__ import annotations

import random

import pytest

from stock_streaming_data_pipeline_spark.operators.isotonic import (
    pava_rates_micro,
)
from stock_streaming_data_pipeline_spark.operators.multipattern import (
    Automaton,
)

PATS = [
    "spark", "hash value", "fast merge", "row scan", "table",
    "batch part", "agg", "slow fast", "value table", "key agg",
]


def test_automaton_matches_str_count_on_random_texts():
    aut = Automaton(PATS)
    rng = random.Random(7)
    words = "key agg row scan slow fast table value part hash merge batch spark a".split()
    for _ in range(300):
        txt = " ".join(rng.choice(words) for _ in range(rng.randint(0, 60)))
        assert aut.counts(txt) == [txt.count(p) for p in PATS], txt


def test_automaton_rejects_bordered_and_empty_patterns():
    with pytest.raises(ValueError, match="border"):
        Automaton(["aa"])  # border 'a': overlap semantics would split
    with pytest.raises(ValueError, match="border"):
        Automaton(["abcab"])  # border 'ab'
    with pytest.raises(ValueError, match="empty"):
        Automaton([""])


def test_automaton_overlapping_cross_pattern_hits():
    # distinct patterns may overlap EACH OTHER freely; both are counted
    aut = Automaton(["ab", "ba"])
    assert aut.counts("ababa") == [2, 2]


def test_pava_monotone_and_mass_preserving():
    rng = random.Random(13)
    for _ in range(200):
        bins = []
        for b in range(rng.randint(1, 40)):
            n = rng.randint(1, 50)
            bins.append((b, n, rng.randint(0, n)))
        out = pava_rates_micro(bins)
        # same bins, same per-bin counts
        assert [(b, n) for b, n, _ in out] == [(b, n) for b, n, _ in bins]
        # monotone non-decreasing fitted rates
        rates = [r for _, _, r in out]
        assert rates == sorted(rates)
        # mass preservation: each pooled block's rate is the half-up
        # micro mean of its members, so |n·rate − 1e6·s| ≤ n/2 per
        # block and the weighted fitted mass matches the raw success
        # mass within the rounding budget globally
        lhs = sum(n * r for _, n, r in out)
        rhs = 1_000_000 * sum(s for _, _, s in bins)
        assert abs(lhs - rhs) <= sum(n for _, n, _ in bins) / 2 + 1


def test_pava_identity_on_already_monotone_input():
    bins = [(0, 10, 1), (1, 10, 3), (2, 10, 3), (3, 10, 9)]
    out = pava_rates_micro(bins)
    assert [r for _, _, r in out] == [100000, 300000, 300000, 900000]


# ---------------------------------------------------------------------------
# Independent witness for the shared-implementation WIS oracle (r10 verdict
# "What's wrong #1"): the DuckDB oracle imports the SAME DP, so the
# cross-engine differential verifies plumbing only. This pins the DP itself
# against exhaustive 2^n subset enumeration — a subtle bug in the p(j)
# bisection or the skip-on-ties reconstruction would survive the
# differential forever but cannot survive this.
# ---------------------------------------------------------------------------


def _feasible(subset):
    """Non-overlap under the documented compat rule end <= start."""
    rows = sorted(subset, key=lambda r: (r[0], r[1]))
    for a, b in zip(rows, rows[1:]):
        if a[1] > b[0]:
            return False
    return True


def _brute_force_wis(rows):
    """(best_total, n_selected) by 2^n enumeration, with n_selected taken
    from the optimal subset that is lexicographically minimal reading the
    membership indicator from the LAST DP-sort index down (absent <
    present) — the independent statement of the DP's skip-on-ties rule:
    at each j descending, the reconstruction takes j only when no optimal
    completion exists without it."""
    rows = sorted(rows, key=lambda r: (r[1], r[0], r[2]))
    n = len(rows)
    best_total = 0
    best_key = tuple([0] * n)
    for m in range(1 << n):
        subset = [rows[j] for j in range(n) if m >> j & 1]
        if not _feasible(subset):
            continue
        total = sum(r[2] for r in subset)
        key = tuple((m >> j) & 1 for j in range(n - 1, -1, -1))
        if total > best_total or (total == best_total and key < best_key):
            best_total, best_key = total, key
    return best_total, sum(best_key)


def test_wis_dp_vs_exhaustive_enumeration():
    from stock_streaming_data_pipeline_spark.operators.scheduling import (
        weighted_interval_best,
    )

    rng = random.Random(1105)
    for trial in range(120):
        n = rng.randint(1, 12)
        seen = set()
        while len(seen) < n:
            s = rng.randint(0, 20)
            seen.add((s, s + rng.randint(1, 10), rng.randint(1, 8)))
        rows = sorted(seen)  # distinct triples: DP sort order unambiguous
        assert weighted_interval_best(rows) == _brute_force_wis(rows), rows


def test_wis_dp_handcrafted_tie_cases():
    from stock_streaming_data_pipeline_spark.operators.scheduling import (
        weighted_interval_best,
    )

    # exact-tie between one big interval and two touching small ones:
    # skip-on-ties prefers dropping the LATER-sorted interval, so the
    # two-interval solution (indices 1 and 2 skipped ... ) — verify via
    # the same independent enumeration rather than asserting by hand
    cases = [
        [(0, 10, 6), (0, 5, 3), (5, 10, 3)],          # 6 == 3+3 tie
        [(0, 2, 4), (2, 4, 4), (0, 4, 8)],            # tie, touching chain
        [(0, 1, 1)],                                  # singleton
        [(0, 3, 5), (1, 2, 5)],                       # nested, equal weight
        [(0, 2, 3), (2, 4, 3), (4, 6, 3), (0, 6, 9)], # 3-chain vs spanning
    ]
    for rows in cases:
        assert weighted_interval_best(rows) == _brute_force_wis(rows), rows


def test_cdc_short_doc_contract(spark):
    """Docs shorter than ``gram`` must emit NO chunks (ADVICE r10:
    Spark's sequence(start, stop) steps -1 when start > stop, so an
    unguarded explode gives short docs a descending position list and
    spurious chunks while the DuckDB oracle's range() is empty)."""
    from stock_streaming_data_pipeline_spark.operators.dedup import (
        cdc_chunk_fingerprints,
    )

    df = spark.createDataFrame(
        [("short", "abc"), ("edge7", "abcdefg"), ("edge8", "abcdefgh"),
         ("long", "the quick brown fox jumps over the lazy dog " * 4)],
        "doc_id string, text string",
    )
    out = cdc_chunk_fingerprints(df, id_col="doc_id", text_col="text", gram=8)
    docs = {r["doc"] for r in out.collect()}
    assert "short" not in docs and "edge7" not in docs
    assert "edge8" in docs and "long" in docs
