"""Pure-Python XXH64 — bit-exact twin of Spark's `F.xxhash64` (seed 42).

Spark's `xxhash64` expression hashes a string column's UTF-8 bytes with
XXH64 and the fixed seed 42 (public algorithm, Cyan4973/xxHash spec;
Spark impl: org.apache.spark.sql.catalyst.expressions.XxHash64).
The reference simulator (sim.py) needs the same url_hash values the
engine computes JVM-side, so ordering tie-breaks and seen-set keys agree
exactly — equality is pinned by tests/test_frontier.py.

NOTE on Spark semantics: for a STRING column Spark hashes the raw UTF-8
bytes; the result is a signed 64-bit long.
"""

from __future__ import annotations

MASK64 = 0xFFFFFFFFFFFFFFFF

P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * P2) & MASK64
    acc = _rotl(acc, 31)
    return (acc * P1) & MASK64


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & MASK64


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of `data`; returns SIGNED 64-bit int (Spark long)."""
    n = len(data)
    idx = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & MASK64
        v2 = (seed + P2) & MASK64
        v3 = seed & MASK64
        v4 = (seed - P1) & MASK64
        while idx <= n - 32:
            v1 = _round(v1, int.from_bytes(data[idx : idx + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[idx + 8 : idx + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[idx + 16 : idx + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[idx + 24 : idx + 32], "little"))
            idx += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK64
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + P5) & MASK64
    h = (h + n) & MASK64
    while idx <= n - 8:
        h ^= _round(0, int.from_bytes(data[idx : idx + 8], "little"))
        h = (_rotl(h, 27) * P1 + P4) & MASK64
        idx += 8
    if idx <= n - 4:
        h ^= (int.from_bytes(data[idx : idx + 4], "little") * P1) & MASK64
        h = (_rotl(h, 23) * P2 + P3) & MASK64
        idx += 4
    while idx < n:
        h ^= (data[idx] * P5) & MASK64
        h = (_rotl(h, 11) * P1) & MASK64
        idx += 1
    h ^= h >> 33
    h = (h * P2) & MASK64
    h ^= h >> 29
    h = (h * P3) & MASK64
    h ^= h >> 32
    # to signed
    return h - (1 << 64) if h >= (1 << 63) else h


def url_hash64(url_canon: str) -> int:
    """Python twin of `F.xxhash64(url_canon)` on a string column."""
    return xxh64(url_canon.encode("utf-8"))
