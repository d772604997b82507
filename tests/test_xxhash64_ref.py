"""Pure-Python xxHash64 reference pin for Spark's ``xxhash64``.

The hash-fixture oracle chain (operators/hash_fixtures.py) replays the
MinHash/SimHash pipelines in DuckDB SQL from materialized xxhash64 values —
which verifies everything EXCEPT the hash itself. This test closes that loop:
a from-the-spec xxHash64 implementation (Cyan4973/xxHash, XXH64 variant —
public algorithm) must agree bit-for-bit with Spark's ``F.xxhash64`` (seed
42, the expression's fixed default) on UTF-8 byte strings covering every
tail-length branch (0..32+ bytes) and non-ASCII multibyte input.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Reference XXH64 over ``data`` with Spark's sign convention (returns
    the signed two's-complement value Spark's LongType carries)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# Every tail branch: empty, <4, exactly 4, 4<len<8, exactly 8, 8<len<16 with
# 4-byte tail, 16..31 (multi 8-byte tail), exactly 32 (one stripe), stripe +
# every tail class, multi-stripe, and multibyte UTF-8.
_CASES = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "hello world",
    "0123456789abcdef",
    "0123456789abcdef0123456789abc",
    "0123456789abcdef0123456789abcdef",
    "0123456789abcdef0123456789abcdefX",
    "0123456789abcdef0123456789abcdef0123",
    "0123456789abcdef0123456789abcdef01234567",
    "the quick brown fox jumps over the lazy dog " * 3,
    "Müller GmbH",
    "Société Générale S.A. — ünïcode ✓",
    "日本語のテキスト",
]


def test_spark_xxhash64_matches_reference(spark):
    df = spark.createDataFrame([(s,) for s in _CASES], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", F.xxhash64("s").alias("h")).collect()
    }
    for s in _CASES:
        assert got[s] == xxh64(s.encode("utf-8")), repr(s)


def test_fixture_mask_matches_minhash_input(spark):
    """The shingle fixture stores xxhash64 & 0xFFFFFFFF — pin that the masked
    reference value equals the fixture column for a tiny frame, so the
    oracle replay provably starts from the exact values minhash_signatures
    consumes (operators/dedup.py:112)."""
    mask = (1 << 32) - 1
    df = spark.createDataFrame([(s,) for s in _CASES if s], ["s"])
    got = {
        r["s"]: r["x"]
        for r in df.select(
            "s", F.xxhash64("s").bitwiseAND(F.lit(mask)).alias("x")
        ).collect()
    }
    for s, x in got.items():
        assert x == (xxh64(s.encode("utf-8")) & mask), repr(s)
