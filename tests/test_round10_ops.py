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
