"""Pure-Python XXH64 matching Spark's ``xxhash64(string)`` (seed 42).

Spark's xxhash64 expression hashes the UTF-8 bytes of a string with
XXH64, seed 42, and returns the result as a SIGNED long. Used driver-side
to pick a term's postings bucket without launching a Spark job (the bucket
expr in the index layout is ``pmod(xxhash64(term), n_buckets)``). Verified
against the JVM implementation in tests.

Algorithm: public XXH64 spec (Yann Collet, xxhash.com, BSD).
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
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
    return h


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Signed-long result matching Spark's xxhash64(string_col)."""
    u = xxh64(s.encode("utf-8"), seed)
    return u - (1 << 64) if u >= (1 << 63) else u


def term_bucket(term: str, n_buckets: int) -> int:
    """pmod(xxhash64(term), n_buckets) — the index bucket of a term."""
    return spark_xxhash64_str(term) % n_buckets


def xxh64_long_np(vals, seed: int = 42):
    """Vectorized XXH64 of int64 values, matching Spark's
    ``xxhash64(long_col)`` (which hashes the 8 little-endian bytes of the
    long with seed 42). Returns the UNSIGNED uint64 hashes; callers
    needing Spark's ``pmod(xxhash64(id), n)`` take ``% n`` directly on
    the unsigned value (Spark's pmod of the signed long equals the
    unsigned value mod n only when n divides 2^64's residue evenly —
    it does not in general, so we reproduce the signed pmod below).

    Used by the map-side partial-postings encode to assign hot-term
    shards per doc WITHOUT a JVM round trip; parity with the JVM
    expression is test-pinned (tests/test_round6_partial.py)."""
    import numpy as np

    x = np.asarray(vals).astype(np.uint64)
    P1 = np.uint64(_P1)
    P2 = np.uint64(_P2)
    P3 = np.uint64(_P3)
    P4 = np.uint64(_P4)

    def rotl(v, r):
        return (v << np.uint64(r)) | (v >> np.uint64(64 - r))

    # hashLong specialization of the byte-stream path for an 8-byte input
    h = np.uint64((seed + _P5 + 8) & _M)
    h = h ^ (rotl(x * P2, 31) * P1)
    h = rotl(h, 27) * P1 + P4
    h ^= h >> np.uint64(33)
    h *= P2
    h ^= h >> np.uint64(29)
    h *= P3
    h ^= h >> np.uint64(32)
    return h


def pmod_xxh64_long_np(vals, n: int, seed: int = 42):
    """``pmod(xxhash64(long_col), n)`` exactly as Spark computes it: the
    hash is reinterpreted as a SIGNED long, then pmod'd (non-negative)."""
    import numpy as np

    h = xxh64_long_np(vals, seed=seed).astype(np.int64)  # reinterpret signed
    m = h % np.int64(n)  # numpy % on int64 is floored => already pmod
    return m.astype(np.int32)
