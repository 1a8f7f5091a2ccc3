"""Pure-Python XXH64 — an independent reference implementation of the
public xxHash64 algorithm (Yann Collet, BSD; spec at
github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md), bit-compatible
with Spark's ``F.xxhash64`` on STRING input (Spark hashes the UTF-8
bytes with seed 42 and returns the result as a signed BIGINT).

Purpose: differential oracles for pipelines that hash with the
JVM-native ``xxhash64`` for speed (``dedup_minhash_lsh_xxh64``). DuckDB
has no compatible hash, so the oracle recomputes expected outputs in
Python with THIS implementation and freezes them as a VALUES literal —
the same pattern OPQ uses for its learned rotation. The implementation
is deliberately dependency-free (no ``xxhash`` wheel in the sandbox)
and is pinned against Spark's own outputs in tests/test_llmdata.py.
"""

from __future__ import annotations

_MASK64 = (1 << 64) - 1
_P1 = 11400714785074694791
_P2 = 14029467366897019727
_P3 = 1609587929392839161
_P4 = 9650029242287828579
_P5 = 2870177450012600261


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK64
    return (_rotl(acc, 31) * _P1) & _MASK64


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK64


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned 64-bit xxHash64 of ``data`` (default seed 42 = Spark's)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK64
        v2 = (seed + _P2) & _MASK64
        v3 = seed & _MASK64
        v4 = (seed - _P1) & _MASK64
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK64
    h = (h + n) & _MASK64
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK64
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK64
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK64
        h = (_rotl(h, 11) * _P1) & _MASK64
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK64
    h ^= h >> 29
    h = (h * _P3) & _MASK64
    h ^= h >> 32
    return h


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Signed BIGINT ``F.xxhash64(string)`` equivalent: XXH64 over the
    UTF-8 bytes, two's-complement signed like Spark's LongType."""
    u = xxh64(s.encode("utf-8"), seed)
    return u - (1 << 64) if u >= (1 << 63) else u
