"""Vectorized variable-byte codec for posting lists.

Classic VByte: each uint64 is emitted as 7-bit groups, least-significant
first; the high bit marks "more bytes follow". Both encode and decode are
fully numpy-vectorized (no per-value Python loop) — they run inside Arrow
``applyInPandas``/``mapInPandas`` workers over whole posting lists at once,
so the constant factor matters at 10^12-file scale.

The reference has no posting-list storage at all (RediSearch owns the index,
``src/storage/RedisSearchStorage.cpp:93-108``); this codec is the part the
north rule asks us to build natively.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
_MAX_BYTES = 10  # ceil(64/7)


def vb_encode_with_sizes(values: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64 array; also return per-value byte sizes (needed for
    segmented/block offset bookkeeping). Vectorized: nbytes per value via
    threshold sums (exact, no float log), then one fancy-indexed scatter
    per byte position (≤10 passes regardless of array size)."""
    v = np.ascontiguousarray(values, dtype=_U64)
    if v.size == 0:
        return b"", np.empty(0, dtype=np.int64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for i in range(1, _MAX_BYTES):
        nbytes += (v >= (_U64(1) << _U64(7 * i))).astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.empty(int(nbytes.sum()), dtype=np.uint8)
    for i in range(_MAX_BYTES):
        mask = nbytes > i
        if not mask.any():
            break
        chunk = (v[mask] >> _U64(7 * i)) & _U64(0x7F)
        cont = (nbytes[mask] - 1 > i).astype(np.uint8) << 7
        out[offsets[mask] + i] = chunk.astype(np.uint8) | cont
    return out.tobytes(), nbytes


def vb_encode(values: np.ndarray) -> bytes:
    return vb_encode_with_sizes(values)[0]


def vb_decode(buf: bytes | memoryview, offset: int = 0, count: int | None = None) -> np.ndarray:
    """Decode back to uint64. Vectorized: terminator bytes (high bit 0)
    delimit values; positions-within-value come from a cumsum trick and the
    7-bit groups are OR-merged with ``np.add.at``-free shifting.

    ``offset``/``count`` allow decoding a slice (block skipping): start at
    byte ``offset`` and decode ``count`` values."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if offset:
        b = b[offset:]
    if b.size == 0:
        return np.empty(0, dtype=_U64)
    ends = (b & 0x80) == 0
    if count is not None:
        end_positions = np.flatnonzero(ends)
        if end_positions.size < count:
            raise ValueError(
                f"truncated varbyte stream: {end_positions.size} terminated "
                f"values, {count} requested"
            )
        # slice to the count-th terminator even when counts match: trailing
        # continuation bytes past it must never scatter out of bounds
        b = b[: end_positions[count - 1] + 1] if count > 0 else b[:0]
        ends = ends[: b.size]
    elif b.size and (b[-1] & 0x80):
        # no count given: the stream itself must be well-terminated
        raise ValueError("truncated varbyte stream: trailing bytes lack a terminator")
    n_vals = int(ends.sum())
    if n_vals == 0:
        return np.empty(0, dtype=_U64)
    value_id = np.zeros(b.size, dtype=np.int64)
    # First byte of value j+1 follows terminator of value j.
    starts_mask = np.empty(b.size, dtype=bool)
    starts_mask[0] = True
    starts_mask[1:] = ends[:-1]
    np.cumsum(starts_mask, out=value_id)
    value_id -= 1
    start_idx = np.flatnonzero(starts_mask)
    pos_in_value = np.arange(b.size, dtype=np.int64) - start_idx[value_id]
    contrib = (b & 0x7F).astype(_U64) << (_U64(7) * pos_in_value.astype(_U64))
    out = np.zeros(n_vals, dtype=_U64)
    np.bitwise_or.at(out, value_id, contrib)
    return out


# doc_ids are signed int64 (xxhash64); bias to uint64 to keep gaps positive.
_BIAS = np.uint64(1 << 63)


def encode_doc_gaps(sorted_doc_ids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Signed sorted doc_ids -> (first_values_unbiased_u64, gaps_u64).
    Caller handles blocking; here: u = id + 2^63, gaps = diff(u)."""
    u = sorted_doc_ids.astype(np.int64).astype(_U64) + _BIAS
    gaps = np.empty_like(u)
    gaps[0] = u[0]
    gaps[1:] = u[1:] - u[:-1]
    return u, gaps


def unbias(u: np.ndarray) -> np.ndarray:
    """uint64 biased -> signed int64 doc_ids."""
    return (u - _BIAS).astype(np.int64)
