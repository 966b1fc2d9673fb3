"""Codec kernels: SmallFloat port, FOR/varint round-trips, selective
block decode, competitive-impacts Pareto property.

Mirrors the reference's codec conformance strategy
(BasePostingsFormatTestCase / RandomPostingsTester — random posting
lists must round-trip exactly; SURVEY §5)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_spark.codec.forutil import BLOCK_SIZE, decode_blocks, pack_postings, unpack_postings
from lucene_spark.codec.impacts import block_impacts, competitive_impacts
from lucene_spark.codec.smallfloat import (
    NORM_LENGTH_TABLE,
    byte4_to_int,
    int4_to_long,
    int_to_byte4,
    int_to_byte4_np,
    long_to_int4,
)


class TestSmallFloat:
    def test_identity_below_free_values(self):
        for i in range(24):
            assert int_to_byte4(i) == i
            assert byte4_to_int(i) == i

    def test_known_reference_values(self):
        # longToInt4(Integer.MAX_VALUE) = 231 → NUM_FREE_VALUES = 24
        assert long_to_int4(2**31 - 1) == 231
        assert int_to_byte4(2**31 - 1) == 255

    def test_round_trip_idempotent(self):
        # intToByte4(byte4ToInt(b)) == b for all bytes (codec contract)
        for b in range(256):
            assert int_to_byte4(byte4_to_int(b)) == b

    def test_monotone_and_lossy_floor(self):
        prev = -1
        for i in range(0, 70000, 7):
            b = int_to_byte4(i)
            assert b >= prev
            assert byte4_to_int(b) <= i
            prev = b

    def test_length_table_strictly_increasing(self):
        assert (np.diff(NORM_LENGTH_TABLE) > 0).all()

    @given(st.integers(min_value=0, max_value=2**31 - 1))
    def test_vectorized_matches_scalar(self, x):
        assert int_to_byte4_np(np.array([x]))[0] == int_to_byte4(x)

    def test_int4_round_trip(self):
        for i in range(0, 2**10):
            enc = long_to_int4(i)
            assert int4_to_long(enc) <= i


posting_lists = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=2**30),  # gap
        st.integers(min_value=1, max_value=2**20),  # tf
        st.integers(min_value=0, max_value=255),  # norm
    ),
    min_size=0,
    max_size=700,
)


class TestForUtil:
    @given(posting_lists)
    @settings(max_examples=60, deadline=None)
    def test_round_trip(self, entries):
        gaps = np.array([g for g, _, _ in entries], dtype=np.int64)
        docs = np.cumsum(gaps) - 1
        tfs = np.array([t for _, t, _ in entries], dtype=np.int64)
        norms = np.array([n for _, _, n in entries], dtype=np.int64)
        blob, block_last = pack_postings(docs, tfs, norms)
        d2, t2, n2 = unpack_postings(blob)
        assert (d2 == docs).all()
        assert (t2 == tfs).all()
        assert (n2 == norms).all()
        assert len(block_last) == (len(docs) + BLOCK_SIZE - 1) // BLOCK_SIZE
        if len(block_last):
            expected_last = [docs[min((b + 1) * BLOCK_SIZE, len(docs)) - 1] for b in range(len(block_last))]
            assert (block_last == np.array(expected_last)).all()

    @pytest.mark.parametrize("n", [1, 127, 128, 129, 256, 1000, 10000])
    def test_boundary_lengths(self, n):
        rng = np.random.default_rng(n)
        docs = np.cumsum(rng.integers(1, 1000, n)) - 1
        tfs = rng.integers(1, 100, n)
        norms = rng.integers(0, 256, n)
        blob, _ = pack_postings(docs, tfs, norms)
        d2, t2, n2 = unpack_postings(blob)
        assert (d2 == docs).all() and (t2 == tfs).all() and (n2 == norms).all()

    def test_compression_beats_raw(self):
        # small gaps should compress far below 8 bytes/doc
        docs = np.arange(0, 100000, 3, dtype=np.int64)
        tfs = np.ones(len(docs), dtype=np.int64)
        norms = np.full(len(docs), 17, dtype=np.int64)
        blob, _ = pack_postings(docs, tfs, norms)
        assert len(blob) < len(docs) * 2.5

    @pytest.mark.parametrize("n", [5, 128, 300, 1000])
    def test_selective_decode_equals_full(self, n):
        rng = np.random.default_rng(n)
        docs = np.cumsum(rng.integers(1, 50, n)) - 1
        tfs = rng.integers(1, 9, n)
        norms = rng.integers(0, 256, n)
        blob, block_last = pack_postings(docs, tfs, norms)
        n_blocks = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
        # every single block decodes to the right slice
        for b in range(n_blocks):
            d, t, nm = decode_blocks(blob, [b], block_last)
            lo, hi = b * BLOCK_SIZE, min((b + 1) * BLOCK_SIZE, n)
            assert (d == docs[lo:hi]).all()
            assert (t == tfs[lo:hi]).all()
            assert (nm == norms[lo:hi]).all()
        # subsets concat correctly
        pick = list(range(0, n_blocks, 2))
        d, t, nm = decode_blocks(blob, pick, block_last)
        exp = np.concatenate([docs[b * BLOCK_SIZE : (b + 1) * BLOCK_SIZE] for b in pick])
        assert (d == exp).all()


class TestImpacts:
    @given(
        st.lists(
            st.tuples(st.integers(1, 50), st.integers(0, 255)),
            min_size=1,
            max_size=128,
        )
    )
    @settings(max_examples=60, deadline=None)
    def test_pareto_frontier_definition(self, pairs):
        """competitive iff no OTHER pair has freq >= f and norm <= n
        (CompetitiveImpactAccumulator.java:71-118)."""
        tfs = np.array([f for f, _ in pairs])
        norms = np.array([n for _, n in pairs])
        got = set(competitive_impacts(tfs, norms))
        allp = set(zip(tfs.tolist(), norms.tolist()))
        expected = {
            (f, n)
            for (f, n) in allp
            if not any((f2 >= f and n2 <= n and (f2, n2) != (f, n)) for f2, n2 in allp)
        }
        # frontier members must dominate every input pair
        for f, n in allp:
            assert any(fg >= f and ng <= n for fg, ng in got)
        assert got == expected

    def test_block_split(self):
        tfs = np.arange(1, 300)
        norms = np.full(299, 10)
        blocks = block_impacts(tfs, norms)
        assert len(blocks) == 3
        assert blocks[0] == [(128, 10)]
        assert blocks[2] == [(299, 10)]
