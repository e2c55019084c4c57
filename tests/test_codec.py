"""Posting codec: varint round-trips, block structure, max-score bounds."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from auctus_ray.index.codec import (
    BLOCK_SIZE,
    decode_block,
    encode_blocks,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_edges():
    vals = np.array(
        [0, 1, 127, 128, 129, 2**14 - 1, 2**14, 2**32, 2**63 - 1, 2**64 - 1],
        dtype=np.uint64,
    )
    buf = varint_encode(vals)
    out = varint_decode(buf, len(vals))
    assert (out == vals).all()


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500))
def test_varint_roundtrip_property(xs):
    vals = np.array(xs, dtype=np.uint64)
    assert (varint_decode(varint_encode(vals), len(vals)) == vals).all()


def test_encode_blocks_roundtrip_and_maxscore():
    rng = np.random.default_rng(7)
    n = 1000
    doc_ids = np.sort(rng.choice(10**7, n, replace=False)).astype(np.uint64)
    tfs = rng.integers(1, 50, n).astype(np.uint64)
    dls = rng.integers(1, 5000, n).astype(np.uint64)
    avgdl = 120.0
    blocks = encode_blocks(doc_ids, tfs, dls, avgdl)
    assert len(blocks["block_id"]) == (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    got_docs, got_tfs, got_dls = [], [], []
    for blob, bn, first, last, mx in zip(
        blocks["blob"], blocks["n"], blocks["first_docid"],
        blocks["last_docid"], blocks["max_tfnorm"],
    ):
        d, t, l = decode_block(blob, bn)
        assert d[0] == first and d[-1] == last
        # max_tfnorm is a true upper bound for every posting in the block
        from auctus_ray import B, K1

        tfn = t.astype(np.float64) / (
            t + K1 * (1.0 - B + B * l.astype(np.float64) / avgdl)
        )
        assert tfn.max() <= mx + 1e-15
        got_docs.append(d); got_tfs.append(t); got_dls.append(l)
    assert (np.concatenate(got_docs) == doc_ids).all()
    assert (np.concatenate(got_tfs) == tfs).all()
    assert (np.concatenate(got_dls) == dls).all()


def test_empty_postings():
    out = encode_blocks(
        np.empty(0, np.uint64), np.empty(0, np.uint64), np.empty(0, np.uint64), 1.0
    )
    assert out["block_id"] == []
