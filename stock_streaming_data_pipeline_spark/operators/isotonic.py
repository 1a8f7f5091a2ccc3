"""Isotonic regression — pool-adjacent-violators (PAVA) over a bounded grid.

The classifier-calibration primitive (Zadrozny & Elkan, KDD'02; Robertson
et al.'s PAVA): fit the best monotone non-decreasing rate curve to
per-bin (count, successes) observations by pooling adjacent bins that
violate monotonicity. PAVA is a sequential left-to-right fold — not a
window/aggregate composition — but it only ever runs over the BOUNDED
binned relation (the fact table collapses to <= n_bins rows first), so
the Spark plan does one map-combined groupBy to the grid and applies the
DP per group via applyInPandas; the literal-VALUES oracle imports the
SAME implementation, so the cross-engine differential verifies the
distributed plumbing (binning, grouping, Arrow round-trip).

Arithmetic stays in exact integers: blocks carry (sum_n, sum_s) and the
pooling comparison s_a * n_b >= s_b * n_a is exact cross-multiplication;
only the final reported rate is half-up micro-quantized.
"""

from __future__ import annotations


def pava_rates_micro(
    bins: list[tuple[int, int, int]],
) -> list[tuple[int, int, int]]:
    """``[(bin, n, s)]`` sorted by bin -> ``[(bin, n, rate_micro)]``.

    Pools adjacent blocks while the left block's rate EXCEEDS the
    right's (strict violation: s_l * n_r > s_r * n_l — exact integer
    cross-multiplication, no float compare), then assigns every bin its
    pooled block's half-up micro rate. Equal rates are already monotone
    and stay unpooled, so the output is a deterministic function of the
    input alone.
    """
    blocks: list[list[int]] = []  # [first_idx, n, s]
    for idx, (_, n, s) in enumerate(bins):
        blocks.append([idx, n, s])
        while len(blocks) >= 2:
            fl, nl, sl = blocks[-2]
            fr, nr, sr = blocks[-1]
            if sl * nr > sr * nl:  # left rate > right rate: violation
                blocks.pop()
                blocks[-1] = [fl, nl + nr, sl + sr]
            else:
                break
    out: list[tuple[int, int, int]] = []
    for bi, (first, n, s) in enumerate(blocks):
        last = blocks[bi + 1][0] if bi + 1 < len(blocks) else len(bins)
        rate_micro = (2 * s * 1_000_000 + n) // (2 * n)
        for idx in range(first, last):
            b, n_i, _ = bins[idx]
            out.append((b, n_i, rate_micro))
    return out
