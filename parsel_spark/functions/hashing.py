"""Hash functions bit-compatible with Spark's JVM-side ``hash()``
(Murmur3_x86_32, seed 42) and ``xxhash64()`` (XXH64, seed 42).

At scale the DataFrame plan uses the built-in JVM expressions
(``F.hash``/``F.xxhash64`` — codegen'd, zero Python); these pure-Python
twins exist so the single-process oracle crawler and the bloom-shard
maintenance code compute *identical* hashes (exact seen-set parity is a
north-rule requirement).  Parity is pinned by tests against Spark.

Algorithm references: public xxHash and MurmurHash3 specifications and
the Apache Spark ``Murmur3_x86_32.hashUnsafeBytes`` /
``XXH64.hashUnsafeBytes`` semantics (sign-extended tail bytes for
murmur3; standard tail handling for XXH64).
"""

from __future__ import annotations

import struct

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5

SPARK_HASH_SEED = 42


def _rotl64(value: int, shift: int) -> int:
    return ((value << shift) | (value >> (64 - shift))) & _M64


def _rotl32(value: int, shift: int) -> int:
    return ((value << shift) | (value >> (32 - shift))) & _M32


def xxhash64(data: bytes | str, seed: int = SPARK_HASH_SEED) -> int:
    """XXH64 returning Spark's signed-64 value."""
    if isinstance(data, str):
        data = data.encode("utf-8")
    length = len(data)
    index = 0

    if length >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P64_1) & _M64
        limit = length - 32
        while index <= limit:
            k1, k2, k3, k4 = struct.unpack_from("<QQQQ", data, index)
            v1 = (_rotl64((v1 + k1 * _P64_2) & _M64, 31) * _P64_1) & _M64
            v2 = (_rotl64((v2 + k2 * _P64_2) & _M64, 31) * _P64_1) & _M64
            v3 = (_rotl64((v3 + k3 * _P64_2) & _M64, 31) * _P64_1) & _M64
            v4 = (_rotl64((v4 + k4 * _P64_2) & _M64, 31) * _P64_1) & _M64
            index += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P64_2) & _M64, 31) * _P64_1) & _M64
            h = ((h * _P64_1) + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64

    h = (h + length) & _M64

    while index + 8 <= length:
        (k1,) = struct.unpack_from("<Q", data, index)
        h ^= (_rotl64((k1 * _P64_2) & _M64, 31) * _P64_1) & _M64
        h = ((_rotl64(h, 27) * _P64_1) + _P64_4) & _M64
        index += 8
    if index + 4 <= length:
        (k1,) = struct.unpack_from("<I", data, index)
        h ^= (k1 * _P64_1) & _M64
        h = ((_rotl64(h, 23) * _P64_2) + _P64_3) & _M64
        index += 4
    while index < length:
        h ^= (data[index] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        index += 1

    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * 0x1B873593) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def _fmix32(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def murmur3_32(data: bytes | str, seed: int = SPARK_HASH_SEED) -> int:
    """Spark-compatible Murmur3_x86_32 returning the signed-32 value.

    Matches ``Murmur3_x86_32.hashUnsafeBytes``: 4-byte little-endian
    blocks, then each remaining byte SIGN-EXTENDED and mixed as a full
    round (this differs from canonical murmur3 tails — it is what
    Spark's ``hash()`` does for strings/binary).
    """
    if isinstance(data, str):
        data = data.encode("utf-8")
    length = len(data)
    aligned = length - length % 4
    h1 = seed & _M32
    for offset in range(0, aligned, 4):
        (block,) = struct.unpack_from("<i", data, offset)
        h1 = _mix_h1(h1, _mix_k1(block & _M32))
    for offset in range(aligned, length):
        byte = data[offset]
        if byte >= 0x80:
            byte -= 0x100  # sign extension, as Platform.getByte does
        h1 = _mix_h1(h1, _mix_k1(byte & _M32))
    return _fmix32(h1, length)


def shard_of(url: str, num_shards: int) -> int:
    """Stable shard id: pmod(murmur3(url), S) — matches the Spark-side
    ``pmod(hash(url), S)`` expression."""
    return murmur3_32(url) % num_shards
