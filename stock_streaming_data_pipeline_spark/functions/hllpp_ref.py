"""Pure-Python/numpy HyperLogLog++ — a bit-exact replica of Spark's
``approx_count_distinct`` for BIGINT columns.

Why this exists: HLL++ register merge is MAX — fully commutative and
associative — so unlike rank-based sketches (Greenwald-Khanna
``approx_percentile``) the estimate is a pure function of the input
VALUE SET, independent of partitioning and merge order. That makes the
"engine-specific by design" sketch differentially testable after all:
recompute the registers and the estimator here, freeze the expected
counts as a VALUES literal, and DuckDB replays them (the OPQ / xxh64
literal-oracle precedent).

Semantics replicated from public sources:
- the HLL++ paper (Heule, Nunkesser, Hall, EDBT 2013): register update,
  linear counting, bias correction via K-nearest-neighbor interpolation;
- Apache Spark's implementation choices (Apache-2.0,
  ``org.apache.spark.sql.catalyst.util.HyperLogLogPlusPlusHelper``):
  xxHash64(seed=42) of the value, idx = top p hash bits,
  rank = nlz((hash << p) | 1 << (p-1)) + 1, the patched THRESHOLDS
  table (15500 for p=14, SPARK-18432), the
  ``(p < 19 && H <= threshold) || E <= 2.5m -> linear counting`` branch,
  and zInverse accumulated in register-index order (float addition is
  not associative; matching the order makes the double bit-exact).

Correction tables are frozen in ``hllpp_tables`` (regenerate/verify with
``tools/dump_hllpp_tables.py``); every piece is pinned against Spark in
``tests/test_sketches.py`` (hash fuzz, estimateBias fuzz vs the JVM
method, end-to-end estimates across all three estimator regimes).
"""

from __future__ import annotations

import bisect
import math

import numpy as np

from stock_streaming_data_pipeline_spark.functions.hllpp_tables import (
    BIAS_DATA,
    RAW_ESTIMATE_DATA,
    THRESHOLDS,
)

_U = np.uint64
_P64_1 = _U(11400714785074694791)
_P64_2 = _U(14029467366897019727)
_P64_3 = _U(1609587929392839161)
_P64_4 = _U(9650029242287828579)
_P64_5 = _U(2870177450012600261)

# HLL++ bias interpolation uses the K nearest raw-estimate neighbors.
_K = 6


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << _U(r)) | (x >> _U(64 - r))


def xxh64_long(vals: np.ndarray, seed: int = 42) -> np.ndarray:
    """Vectorized ``XXH64.hashLong`` (Spark's ``F.xxhash64`` on one BIGINT
    column): the 8-byte single-lane path of public xxHash64. Returns
    uint64; reinterpret via ``.view(np.int64)`` for Spark's signed view."""
    with np.errstate(over="ignore"):
        v = np.asarray(vals, dtype=np.int64).view(np.uint64)
        acc = _U(seed) + _P64_5 + _U(8)
        acc = acc ^ (_rotl(v * _P64_2, 31) * _P64_1)
        acc = _rotl(acc, 27) * _P64_1 + _P64_4
        acc ^= acc >> _U(33)
        acc *= _P64_2
        acc ^= acc >> _U(29)
        acc *= _P64_3
        acc ^= acc >> _U(32)
        return acc


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Vectorized exact bit length of uint64 values (no float detours —
    a double mantissa cannot represent all 64-bit patterns)."""
    bl = np.zeros(x.shape, np.uint64)
    t = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = t >= (_U(1) << _U(s))
        bl += big.astype(np.uint64) * _U(s)
        t = np.where(big, t >> _U(s), t)
    bl += (t > 0).astype(np.uint64)
    return bl


def p_for_rsd(rsd: float) -> int:
    """Spark's precision choice: smallest p with 1.04/sqrt(2^p) <= rsd
    (ceil(2*log2(1.106/rsd)), HyperLogLogPlusPlusHelper constructor)."""
    p = int(math.ceil(2.0 * math.log(1.106 / rsd) / math.log(2.0)))
    if p < 4:
        raise ValueError("HLL++ requires at least 4 bits for addressing")
    return p


def registers(vals: np.ndarray, *, p: int) -> np.ndarray:
    """The 2^p max-rank registers for a batch of non-null BIGINT values.
    Merge across batches with ``np.maximum`` — commutative, like Spark's
    partial-aggregate merge."""
    m = 1 << p
    h = xxh64_long(vals)
    idx = (h >> _U(64 - p)).astype(np.int64)
    w = (h << _U(p)) | _U(1 << (p - 1))
    rank = (_U(64) - _bit_length(w) + _U(1)).astype(np.int64)
    regs = np.zeros(m, np.int64)
    np.maximum.at(regs, idx, rank)
    return regs


def _estimate_bias(e: float, p: int) -> float:
    """Spark's estimateBias: binary-search the raw-estimate table, slide
    a K-wide window toward the nearer neighbors (strict <), average the
    corresponding bias entries."""
    est = RAW_ESTIMATE_DATA[p]
    n = len(est)
    nearest = bisect.bisect_left(est, e)

    def dist(i: int) -> float:
        d = e - est[i]
        return d * d

    low = max(nearest - _K + 1, 0)
    high = min(low + _K, n)
    while high < n and dist(high) < dist(low):
        low += 1
        high += 1
    # plain left-to-right sum, matching Java's accumulation order
    return sum(BIAS_DATA[p][low:high]) / (high - low)


def estimate(regs: np.ndarray, *, p: int) -> int:
    """Spark's query(): linear counting / bias-corrected / raw estimate,
    with zInverse summed in register-index order for bit-exact doubles."""
    m = 1 << p
    zi = 0.0
    v_zero = 0.0
    for r in regs.tolist():
        zi += 1.0 / float(1 << r)
        if r == 0:
            v_zero += 1.0
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
    e_raw = alpha_m2 / zi

    def e_bias_corrected(e: float) -> float:
        if p < 19 and e < 5.0 * m:
            return e - _estimate_bias(e, p)
        return e

    if v_zero > 0:
        h = m * math.log(m / v_zero)
        if (p < 19 and h <= THRESHOLDS[p - 4]) or e_raw <= 2.5 * m:
            est = h
        else:
            est = e_bias_corrected(e_raw)
    else:
        est = e_bias_corrected(e_raw)
    # Java Math.round(double) == floor(x + 0.5) for these magnitudes.
    return int(math.floor(est + 0.5))


def approx_count_distinct_long(vals: np.ndarray, rsd: float = 0.05) -> int:
    """``F.approx_count_distinct(col, rsd)`` for a non-null BIGINT column,
    bit-exact to Spark regardless of how Spark partitioned the data."""
    p = p_for_rsd(rsd)
    if p not in RAW_ESTIMATE_DATA:
        raise ValueError(
            f"p={p} not frozen in hllpp_tables; rerun "
            f"tools/dump_hllpp_tables.py --p {p}"
        )
    return estimate(registers(np.asarray(vals), p=p), p=p)
