"""Vectorized bit-packing / frame-of-reference primitives (numpy only).

These are the storage-level building blocks every codec shares: dictionary
codes, run lengths, string lengths and FOR deltas are all stored as
width-minimal bit-packed unsigned ints. Equivalent role to parquet-mr's
RLE/bit-packing hybrid that the reference delegates to (it never
implements its own — Schema.java writes through RecordConsumer); here we
implement it natively per the north_rule.
"""

from __future__ import annotations

import numpy as np


def bit_width(max_val: int) -> int:
    """Bits needed to store values in [0, max_val]."""
    return max(1, int(max_val).bit_length())


def pack_uints(a: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints into `width`-bit little-endian bitstream."""
    if len(a) == 0:
        return b""
    a = np.ascontiguousarray(a, dtype=np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((a[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_uints(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of pack_uints -> uint64 array of length n."""
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    bits = np.unpackbits(
        np.frombuffer(buf, dtype=np.uint8), count=n * width, bitorder="little"
    ).reshape(n, width)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts).sum(axis=1, dtype=np.uint64)


def pack_mask(mask: np.ndarray) -> bytes:
    """Pack a boolean mask (True = null) into a bitmap."""
    if len(mask) == 0:
        return b""
    return np.packbits(mask.astype(np.uint8), bitorder="little").tobytes()


def unpack_mask(buf: bytes, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=bool)
    return (
        np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n, bitorder="little")
        .astype(bool)
    )


def zigzag_encode(a: np.ndarray) -> np.ndarray:
    """Map signed int64 -> unsigned (0,-1,1,-2 -> 0,1,2,3)."""
    a = a.astype(np.int64)
    return ((a << 1) ^ (a >> 63)).view(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    u = u.astype(np.uint64)
    return ((u >> np.uint64(1)).view(np.int64)) ^ -((u & np.uint64(1)).view(np.int64))


def run_starts(codes: np.ndarray) -> np.ndarray:
    """Indices where a new run begins (always includes 0)."""
    if len(codes) == 0:
        return np.empty(0, dtype=np.int64)
    changes = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    return np.concatenate([[0], changes]).astype(np.int64)
