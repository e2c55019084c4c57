"""Posting-list compression: delta + varint blocks with skip metadata.

Replaces the role of Lucene's postings format inside the reference's
Elasticsearch (docker-compose.yml:4 in /root/reference) with an explicit,
testable codec:

  * postings for one (term, docID-range) are split into blocks of
    ``BLOCK_SIZE`` entries;
  * each block stores ``(delta-varint docID, varint tf, varint dl)``
    triples — dl (doc token length) is carried in the posting so BM25
    scoring is self-contained and per-block max-score is exact;
  * per block we keep skip metadata (first/last docID, count) and the
    block's maximum *idf-free* score component
    ``max_tfnorm = max tf / (tf + k1*(1-b + b*dl/avgdl))`` so block-max
    WAND pruning (query layer) only needs ``idf * max_tfnorm``.

Varint encode/decode is vectorized with numpy (no per-int Python loop).
"""

from __future__ import annotations

import numpy as np

from auctus_ray import B, K1

BLOCK_SIZE = 128


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array, vectorized."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (at least 1)
    nbits = np.maximum(1, 64 - _clz64(v))
    ngroups = (nbits + 6) // 7
    total = int(ngroups.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(ngroups)
    starts = ends - ngroups
    # position of each output byte within its value
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, ngroups)
    vals = np.repeat(v, ngroups)
    shifted = (vals >> (pos.astype(np.uint64) * np.uint64(7))) & np.uint64(0x7F)
    out[:] = shifted.astype(np.uint8)
    # continuation bit on all but the last byte of each value
    is_last = np.zeros(total, dtype=bool)
    is_last[ends - 1] = True
    out[~is_last] |= 0x80
    return out.tobytes()


def varint_decode(buf: bytes, count: int) -> np.ndarray:
    """Decode ``count`` LEB128 varints from buf -> uint64 array, vectorized."""
    if count == 0:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    # value index for each byte
    vid = np.zeros(b.size, dtype=np.int64)
    vid[1:] = np.cumsum(is_last)[:-1]
    if int(is_last.sum()) < count:
        raise ValueError("varint buffer truncated")
    # byte position within each value
    starts = np.zeros(b.size, dtype=bool)
    starts[0] = True
    starts[1:] = is_last[:-1]
    start_idx = np.flatnonzero(starts)
    pos = np.arange(b.size, dtype=np.int64) - np.repeat(
        start_idx, np.diff(np.append(start_idx, b.size))
    )
    contrib = (b & 0x7F).astype(np.uint64) << (pos.astype(np.uint64) * np.uint64(7))
    out = np.zeros(count, dtype=np.uint64)
    np.add.at(out, vid, contrib)
    return out


def _clz64(v: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64s via float64 exponent trick + fixups."""
    # bit_length = floor(log2(v)) + 1 for v>0; use frexp on float64 — exact
    # for v < 2**53, and for larger values compute on the top 32 bits.
    v = v.astype(np.uint64)
    hi = (v >> np.uint64(32)).astype(np.float64)
    lo = v.astype(np.float64)
    bl_hi = np.frexp(hi)[1]  # bit length of high word
    bl_lo = np.frexp(lo)[1]
    bl = np.where(hi > 0, bl_hi + 32, bl_lo)
    return (64 - bl).astype(np.int64)


def encode_blocks(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    dls: np.ndarray,
    avgdl: float,
    block_size: int = BLOCK_SIZE,
) -> dict[str, list]:
    """Encode sorted postings into blocks.

    Returns dict of equal-length lists (one element per block):
      block_id, first_docid, last_docid, n, blob, max_tfnorm
    ``doc_ids`` must be strictly increasing.
    """
    n = doc_ids.size
    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.uint64)
    tfs = np.ascontiguousarray(tfs, dtype=np.uint64)
    dls = np.ascontiguousarray(dls, dtype=np.uint64)
    tfnorm = _tfnorm(tfs.astype(np.float64), dls.astype(np.float64), avgdl)
    out: dict[str, list] = {
        "block_id": [],
        "first_docid": [],
        "last_docid": [],
        "n": [],
        "blob": [],
        "max_tfnorm": [],
    }
    for bi, s in enumerate(range(0, n, block_size)):
        e = min(s + block_size, n)
        ids = doc_ids[s:e]
        deltas = np.empty(e - s, dtype=np.uint64)
        deltas[0] = ids[0]
        deltas[1:] = ids[1:] - ids[:-1]
        # interleave (delta, tf, dl) so one varint stream per block
        inter = np.empty((e - s) * 3, dtype=np.uint64)
        inter[0::3] = deltas
        inter[1::3] = tfs[s:e]
        inter[2::3] = dls[s:e]
        out["block_id"].append(bi)
        out["first_docid"].append(int(ids[0]))
        out["last_docid"].append(int(ids[-1]))
        out["n"].append(e - s)
        out["blob"].append(varint_encode(inter))
        out["max_tfnorm"].append(float(tfnorm[s:e].max()))
    return out


def decode_block(blob: bytes, n: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode one block -> (doc_ids, tfs, dls)."""
    inter = varint_decode(blob, n * 3)
    deltas = inter[0::3]
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    return doc_ids, inter[1::3], inter[2::3]


def decode_blocks_concat(
    blobs: list[bytes], ns: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Decode ALL blocks of a posting list in one varint pass.

    One numpy call instead of one per block (per-call overhead dominates
    short queries). Delta chains restart at each block, so the global
    cumsum is corrected by subtracting the carry at each block boundary
    (segmented cumsum).
    """
    ns = np.asarray(ns, dtype=np.int64)
    total = int(ns.sum())
    inter = varint_decode(b"".join(blobs), total * 3)
    deltas = inter[0::3]
    gcs = np.cumsum(deltas, dtype=np.uint64)
    if len(blobs) > 1:
        bounds = np.cumsum(ns)[:-1]  # first index of blocks 1..k-1
        carry = np.concatenate([[np.uint64(0)], gcs[bounds - 1]])
        doc_ids = gcs - np.repeat(carry, ns)
    else:
        doc_ids = gcs
    return doc_ids, inter[1::3], inter[2::3]


def _tfnorm(tf: np.ndarray, dl: np.ndarray, avgdl: float) -> np.ndarray:
    """BM25 tf-normalization component (idf-free), float64."""
    return tf / (tf + K1 * (1.0 - B + B * dl / avgdl))


def bm25_idf(df: np.ndarray | float, n_docs: int) -> np.ndarray | float:
    """Lucene/ES 7.10 BM25 idf: ln(1 + (N - df + 0.5) / (df + 0.5))."""
    return np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
