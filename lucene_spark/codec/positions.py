"""Position stream codec (the .pos file role).

Reference: Lucene stores per-term per-doc position deltas VInt-coded in
a separate .pos file so the doc/freq stream can be read without
touching positions (Lucene90PostingsFormat.java:60-63 file split;
positions written Lucene90PostingsWriter.java). Same split here: the
position blob is a separate nullable column decoded only by phrase
queries.

Layout: for each doc in posting order, ``tf`` varint position deltas
(first absolute, then gaps) — doc boundaries are implied by the tf
array from the doc/freq stream, exactly like the reference.
"""

from __future__ import annotations

import numpy as np

from lucene_spark.codec.forutil import _read_varint, _write_varint


def pack_positions(pos_lists: list[np.ndarray]) -> bytes:
    """pos_lists: per-doc ascending position arrays (len == tf)."""
    out = bytearray()
    for poss in pos_lists:
        prev = 0
        first = True
        for p in poss:
            p = int(p)
            _write_varint(out, p if first else p - prev)
            prev = p
            first = False
    return bytes(out)


def unpack_positions(blob: bytes, tfs: np.ndarray) -> list[np.ndarray]:
    """Inverse using the tf array for doc boundaries."""
    pos = 0
    out = []
    for tf in tfs:
        cur = np.empty(int(tf), dtype=np.int64)
        acc = 0
        for i in range(int(tf)):
            v, pos = _read_varint(blob, pos)
            acc = v if i == 0 else acc + v
            cur[i] = acc
        out.append(cur)
    return out
