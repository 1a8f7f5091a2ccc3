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
