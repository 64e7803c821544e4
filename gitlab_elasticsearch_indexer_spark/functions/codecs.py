"""Posting-list compression kernels: delta encoding + LEB128 varint.

The reference's index delegates this to Lucene (postings are Lucene's
block-encoded segments); here it is rebuilt as numpy-vectorized
encode/decode used inside Arrow pandas UDFs (north_star: "sorted posting
lists (docID delta-encoding + varint/PForDelta compression)").

Both directions are fully vectorized:

* encode — per-value byte counts via ``searchsorted`` on 2^(7k)
  thresholds, then ≤10 rounds of masked scatter (one per varint byte
  position), no per-value Python loop;
* decode — continuation-bit group labeling with ``cumsum``, then one
  shift-or accumulation per byte position.
"""

from __future__ import annotations

import numpy as np

_THRESHOLDS = np.array([1 << (7 * k) for k in range(1, 10)], dtype=np.uint64)
BLOCK_SIZE = 128  # postings per block (Lucene's FOR block size)


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array."""
    if len(values) == 0:
        return b""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    nbytes = np.searchsorted(_THRESHOLDS, v, side="right").astype(np.int64) + 1
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        byte = ((v[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > j + 1).astype(np.uint8) << 7
        out[offsets[mask] + j] = byte | cont
    return out.tobytes()


def varint_decode(buf: bytes) -> np.ndarray:
    """Decode LEB128 bytes back to a uint64 array."""
    if not buf:
        return np.empty(0, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_end = (b & 0x80) == 0
    # group id per byte: 0-based index of the value this byte belongs to
    group = np.concatenate(([0], np.cumsum(is_end)[:-1]))
    n = int(is_end.sum())
    starts = np.concatenate(([0], np.nonzero(is_end)[0][:-1] + 1))
    pos = np.arange(len(b)) - starts[group]
    vals = np.zeros(n, dtype=np.uint64)
    np.bitwise_or.at(
        vals, group, (b & np.uint8(0x7F)).astype(np.uint64) << (7 * pos).astype(np.uint64)
    )
    return vals


def delta_encode(sorted_ids: np.ndarray) -> np.ndarray:
    d = np.asarray(sorted_ids, dtype=np.uint64).copy()
    d[1:] = d[1:] - d[:-1]
    return d


def delta_decode(deltas: np.ndarray) -> np.ndarray:
    return np.cumsum(deltas.astype(np.uint64), dtype=np.uint64)


def pack_postings(doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray) -> tuple[bytes, bytes, bytes]:
    """(sorted doc ids, tfs, dls) → (docs_bin, tfs_bin, dls_bin)."""
    return (
        varint_encode(delta_encode(doc_ids)),
        varint_encode(np.asarray(tfs, dtype=np.uint64)),
        varint_encode(np.asarray(dls, dtype=np.uint64)),
    )


def unpack_postings(docs_bin: bytes, tfs_bin: bytes, dls_bin: bytes) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    docs = delta_decode(varint_decode(docs_bin))
    return docs, varint_decode(tfs_bin), varint_decode(dls_bin)


def block_stats(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray, block: int = BLOCK_SIZE
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-block (last doc id, max tf, min dl) for block-max WAND.

    Stored instead of a pre-baked normalized-tf maximum so the bound is
    independent of the collection's avgdl: BM25 tfn is monotone
    increasing in tf and decreasing in dl, hence tfn(max_tf, min_dl)
    evaluated with the *current* avgdl at query time upper-bounds every
    member of the block even after incremental updates shift avgdl.
    """
    n = len(doc_ids)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    nblocks = (n + block - 1) // block
    last = doc_ids[np.minimum(np.arange(1, nblocks + 1) * block - 1, n - 1)]
    pad = nblocks * block - n
    tf_p = np.pad(tfs.astype(np.int64), (0, pad), constant_values=0)
    dl_p = np.pad(dls.astype(np.int64), (0, pad), constant_values=np.iinfo(np.int64).max)
    bmax_tf = tf_p.reshape(nblocks, block).max(axis=1)
    bmin_dl = dl_p.reshape(nblocks, block).min(axis=1)
    return last.astype(np.int64), bmax_tf, bmin_dl
