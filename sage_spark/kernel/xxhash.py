"""Pure-Python XXH64, bit-compatible with Spark's ``xxhash64`` expression.

Spark's xxhash64(col) applies XXH64 (seed 42) to a string column's UTF-8
bytes and returns the result as a signed 64-bit long. This serial
implementation lets the no-Spark oracle replay (kernel/expected.py) reproduce
hash-derived operators — SimHash bit votes, MinHash signatures, LSH band
buckets — independently of the JVM, which turns those queries into true
differential tests of Spark's hash/bit arithmetic.

Algorithm: the public xxHash spec (XXH64); constants are the standard primes.
Parity with Spark is asserted in tests/test_operators.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        k1 = _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h ^ k1, 27) * _P1) + _P4) & _MASK
        i += 8
    if i <= n - 4:
        h = ((_rotl(h ^ (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _MASK, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def spark_xxhash64(value: str, seed: int = SPARK_SEED) -> int:
    """Spark-identical ``xxhash64(string)``: XXH64 over UTF-8 bytes, returned
    as a SIGNED 64-bit value (two's complement), matching LongType."""
    h = xxh64(value.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_long(value: int, seed: int = SPARK_SEED) -> int:
    """Spark-identical ``xxhash64(long)``: XXH64 over the 8 little-endian
    bytes of the signed long, returned signed."""
    h = xxh64(int(value).to_bytes(8, "little", signed=True), seed)
    return h - (1 << 64) if h >= (1 << 63) else h
