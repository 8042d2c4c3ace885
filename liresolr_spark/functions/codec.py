"""Posting-block codec: delta-gap + LEB128 varint over numpy arrays.

The reference relies on Lucene's delta-gap + VInt posting compression
(surface touched at Lucene46StoredFieldsFormat.java:53-84, which documents
the VInt/packed-int encodings). We implement the same scheme vectorized in
numpy: docID runs are strictly increasing, stored as first value + gaps,
each value LEB128-varint encoded.

All functions operate on uint64 numpy arrays and are O(n) with no Python
per-element loops on the encode hot path beyond the byte-scatter, which is
vectorized via cumulative byte-length offsets.
"""

from __future__ import annotations

import numpy as np


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # byte length per value = number of 7-bit groups; vectorized via
    # threshold comparison (value >= 2^(7k) needs more than k bytes)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= np.uint64(1 << (7 * k))).astype(np.int64)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    work = v.copy()
    max_len = int(nbytes.max())
    for byte_i in range(max_len):
        active = nbytes > byte_i
        idx = offsets[active] + byte_i
        chunk = (work[active] & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[active] - 1) > byte_i  # continuation bit
        out[idx] = chunk | (cont.astype(np.uint8) << 7)
        work[active] >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.array([], dtype=np.uint64)
    is_last = (b & 0x80) == 0
    ends = np.nonzero(is_last)[0]
    starts = np.concatenate(([0], ends[:-1] + 1))
    n = ends.size
    out = np.zeros(n, dtype=np.uint64)
    lengths = ends - starts + 1
    max_len = int(lengths.max())
    payload = (b & 0x7F).astype(np.uint64)
    for byte_i in range(max_len):
        active = lengths > byte_i
        out[active] |= payload[starts[active] + byte_i] << np.uint64(7 * byte_i)
    return out


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing docID run -> [first, gap, gap, ...]."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return d
    out = np.empty_like(d)
    out[0] = d[0]
    out[1:] = d[1:] - d[:-1]
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.uint64)
    return np.cumsum(g, dtype=np.uint64)


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Per-value LEB128 encoded length (vectorized)."""
    v = np.asarray(values, dtype=np.uint64)
    nbytes = np.ones(v.shape, dtype=np.int64)
    for k in range(1, 10):
        nbytes += (v >= np.uint64(1 << (7 * k))).astype(np.int64)
    return nbytes


def varint_encode_slices(values: np.ndarray, bounds: np.ndarray) -> list[bytes]:
    """Encode ONE array, return per-slice bytes for [bounds[i], bounds[i+1]).

    LEB128 is self-delimiting, so slicing the single encoded buffer at
    per-value byte offsets yields exactly what encoding each slice alone
    would — one vectorized pass instead of a Python call per block (the
    index-build hot path)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return [b""] * (len(bounds) - 1)
    buf = varint_encode(v)
    byte_off = np.concatenate(([0], np.cumsum(varint_byte_lengths(v))))
    return [bytes(buf[byte_off[s]:byte_off[e]])
            for s, e in zip(bounds[:-1], bounds[1:])]


def delta_encode_blocked(doc_ids: np.ndarray, starts: np.ndarray) -> np.ndarray:
    """Delta-gap a docID array whose blocks restart at each `starts` index:
    gap stream equals per-block delta_encode output, computed in one pass."""
    d = np.asarray(doc_ids, dtype=np.uint64)
    if d.size == 0:
        return d
    out = np.empty_like(d)
    out[0] = d[0]
    out[1:] = d[1:] - d[:-1]
    out[starts] = d[starts]  # each block's first value is absolute
    return out


def encode_block(
    doc_ids: np.ndarray, tfs: np.ndarray, doclens: np.ndarray
) -> tuple[bytes, bytes, bytes]:
    """(docID run, tf run, doclen run) -> (delta+varint docids, varint tfs,
    varint doclens).

    doclens are denormalized into every block (the analog of Lucene's
    per-field norms living inside the index segment): scoring a posting
    needs the doc's length, and carrying it here means a query reads ONLY
    the blocks of its terms — never a corpus-sized doc-stats table."""
    return (
        varint_encode(delta_encode(doc_ids)),
        varint_encode(tfs),
        varint_encode(doclens),
    )


def decode_block(
    docid_bytes: bytes, tf_bytes: bytes, doclen_bytes: bytes
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    return (
        delta_decode(varint_decode(docid_bytes)),
        varint_decode(tf_bytes),
        varint_decode(doclen_bytes),
    )


def decode_positions(
    pos_bytes: bytes, tfs: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode a block's positions stream (Lucene .pos layout: per posting,
    its within-doc token positions delta-gapped then varint'd, postings
    concatenated — posting i owns exactly tfs[i] values).

    Returns (flat_positions, offsets): posting i's positions are
    flat_positions[offsets[i]:offsets[i+1]], ascending."""
    gaps = varint_decode(pos_bytes)
    offsets = np.concatenate(
        ([0], np.cumsum(np.asarray(tfs, dtype=np.int64))))
    if gaps.size == 0:
        return gaps, offsets
    # one cumsum over the whole stream, then subtract each posting's
    # incoming prefix (its first gap is absolute, so the carry from earlier
    # postings must be removed) — vectorized via np.repeat of the prefix
    flat = np.cumsum(gaps, dtype=np.uint64)
    starts = offsets[:-1]
    lens = np.diff(offsets)
    prefix = np.concatenate(
        ([np.uint64(0)], flat[starts[1:] - 1])) if len(starts) > 1 \
        else np.array([0], dtype=np.uint64)
    return (flat - np.repeat(prefix, lens)).astype(np.uint64), offsets


def positions_byte_slices(pos_bytes: bytes, tfs: np.ndarray) -> list[bytes]:
    """Split a block's positions stream into PER-POSTING byte slices without
    decoding values (LEB128 end-bits mark value boundaries). Positions are
    delta-gapped WITHIN a posting, so each slice is a self-contained stream
    — slices re-concatenate into valid blocks in any posting order (the
    zero-recode path compaction uses to remap docIDs without touching
    positions)."""
    b = np.frombuffer(pos_bytes, dtype=np.uint8)
    tfs = np.asarray(tfs, dtype=np.int64)
    if b.size == 0:
        return [b""] * len(tfs)
    ends = np.nonzero((b & 0x80) == 0)[0]  # last byte of each value
    cum = np.cumsum(tfs)
    # byte offset where posting i starts = end of its predecessor's last
    # value + 1 (0 for the first)
    starts_b = np.concatenate(([0], ends[cum[:-1] - 1] + 1)) if len(cum) > 1 \
        else np.array([0], dtype=np.int64)
    ends_b = np.concatenate((starts_b[1:], [len(b)]))
    raw = bytes(pos_bytes)
    return [raw[s:e] for s, e in zip(starts_b, ends_b)]
