"""Exact port of Lucene's SmallFloat 4-bit norm encoding.

Reference: lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167
(``longToInt4`` / ``int4ToLong`` / ``intToByte4`` / ``byte4ToInt``).

Lucene stores one norm byte per (doc, field): the field length (number
of index tokens, overlaps discounted) encoded through ``intToByte4`` —
identity below ``NUM_FREE_VALUES`` (=24... computed, see below), then a
float-like 4-significant-bit code. BM25 decodes through a 256-entry
``LENGTH_TABLE`` (BM25Similarity.java:122-129). Both directions must be
bit-exact for rank-identical scoring, so this is a literal port plus a
vectorized numpy variant for the build path.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """SmallFloat.longToInt4 — order-preserving 4-significant-bit code."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    encoded |= (shift + 1) << 3
    return encoded


def int4_to_long(i: int) -> int:
    """SmallFloat.int4ToLong — inverse of long_to_int4 (lossy rounding down)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


_MAX_INT4 = long_to_int4(2**31 - 1)
NUM_FREE_VALUES = 255 - _MAX_INT4


def int_to_byte4(i: int) -> int:
    """SmallFloat.intToByte4 — returns the *unsigned* byte value 0..255."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """SmallFloat.byte4ToInt — b is the unsigned byte value 0..255."""
    if b < NUM_FREE_VALUES:
        return b
    return NUM_FREE_VALUES + int4_to_long(b - NUM_FREE_VALUES)


# BM25Similarity.java:122-129 — LENGTH_TABLE[i] = byte4ToInt((byte) i),
# used both to decode norms at scoring time and (as float) for 1/K caches.
NORM_LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)

# Forward lookup: field length (clamped) -> norm byte. intToByte4 is
# monotone, so vectorize via searchsorted over the 256 decode values:
# the encoded byte for length L is the largest i with LENGTH_TABLE[i] <= L
# — exactly what intToByte4 computes (round-down float-like code).
_ENCODE_BOUNDS = NORM_LENGTH_TABLE  # strictly increasing


def int_to_byte4_np(lengths: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over an int array (values >= 0)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    if (lengths < 0).any():
        raise ValueError("Only supports positive values")
    idx = np.searchsorted(_ENCODE_BOUNDS, np.minimum(lengths, 2**31 - 1), side="right") - 1
    return idx.astype(np.uint8)
