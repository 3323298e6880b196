"""Vectorized LEB128 varint + delta posting-block codec.

Replaces the reference's arena linked-list posting storage
(``/root/reference/src/index.rs:351-361,422-433``) with contiguous,
docID-sorted, delta+varint-compressed posting blocks — the layout the
north star asks for and the one that streams through Arrow binary
columns with zero-copy.

All encode/decode paths are numpy-vectorized: no Python loop over
values.  Encoding N values costs ~10 vectorized passes (one per
possible varint byte position); decoding a whole buffer is a single
vectorized scan.

Posting block layout (one *block* per value of a term within one doc
range; a term's full posting list is an ordered sequence of blocks,
possibly spread over several dictionary rows):

    varint stream of:
      n                      number of postings in the block
      first_doc              absolute doc_id of the first posting
      delta[1..n-1]          doc_id deltas (doc ids strictly increasing)
      for f in fields: tf_f[0..n-1]    per-field term frequency
      for f in fields: len_f[0..n-1]   per-field doc length (denormalized
                             to avoid a doc-meta join at query time)

The per-doc occurrence count (df is occurrence-counted,
src/index.rs:281-297) is NOT stored: occ ≡ Σ_f tf_f, reconstructed at
decode — postings exist only for docs where the term occurs, and the
reference creates exactly one pointer per occurrence across all fields.
"""

from __future__ import annotations

import numpy as np

# bump when the posting-block layout changes; stored in the manifest and
# checked at load so a stale index is rebuilt, not misread
FORMAT_VERSION = 4  # v4: term-file first_pos split into doc + first_off

_POW7 = [np.uint64(1) << np.uint64(7 * k) for k in range(10)]


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Byte length of the LEB128 encoding of each uint64 value."""
    a = values.astype(np.uint64, copy=False)
    nb = np.ones(len(a), dtype=np.int64)
    for k in range(1, 10):
        nb[a >= _POW7[k]] = k + 1
    return nb


def varint_encode(values: np.ndarray) -> bytes:
    """Encode an array of uint64 as a concatenated LEB128 stream."""
    a = np.ascontiguousarray(values, dtype=np.uint64)
    if len(a) == 0:
        return b""
    nb = varint_byte_lengths(a)
    total = int(nb.sum())
    out = np.zeros(total, dtype=np.uint8)
    ends = np.cumsum(nb)
    starts = ends - nb
    for j in range(10):
        sel = nb > j
        if not sel.any():
            break
        vals = (a[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb[sel] - 1 > j).astype(np.uint8) << 7  # continuation bit
        out[starts[sel] + j] = vals.astype(np.uint8) | cont
    return out.tobytes()


def varint_decode_all(buf: bytes | np.ndarray) -> np.ndarray:
    """Decode an entire LEB128 stream into a uint64 array (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if len(b) == 0:
        return np.empty(0, dtype=np.uint64)
    term_mask = (b & 0x80) == 0
    ends = np.flatnonzero(term_mask)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    lengths = ends - starts + 1
    n = len(ends)
    vals = np.zeros(n, dtype=np.uint64)
    maxlen = int(lengths.max())
    for j in range(maxlen):
        sel = lengths > j
        vals[sel] |= (b[starts[sel] + j].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(7 * j)
    return vals


def encode_block(doc_ids: np.ndarray,
                 tfs: list[np.ndarray], lens: list[np.ndarray]) -> bytes:
    """Encode one posting block.  ``doc_ids`` must be sorted ascending."""
    n = len(doc_ids)
    d = doc_ids.astype(np.uint64, copy=False)
    deltas = np.diff(d)
    parts = [np.array([n, d[0] if n else 0], dtype=np.uint64), deltas]
    for tf in tfs:
        parts.append(tf.astype(np.uint64, copy=False))
    for ln in lens:
        parts.append(ln.astype(np.uint64, copy=False))
    return varint_encode(np.concatenate(parts))


def decode_blob(blob: bytes, num_fields: int):
    """Decode a blob = concatenation of one or more posting blocks.

    Returns (doc_ids, occ, tfs[F], lens[F]) as uint64 arrays, concatenated
    across blocks in stored order (doc-range order → globally sorted).
    ``occ`` is reconstructed as Σ_f tf_f.
    """
    vals = varint_decode_all(blob)
    out_docs = []
    out_tfs = [[] for _ in range(num_fields)]
    out_lens = [[] for _ in range(num_fields)]
    i = 0
    total = len(vals)
    while i < total:
        n = int(vals[i])
        first = vals[i + 1]
        j = i + 2
        deltas = vals[j:j + max(n - 1, 0)]
        j += max(n - 1, 0)
        docs = np.empty(n, dtype=np.uint64)
        if n:
            docs[0] = first
            if n > 1:
                np.cumsum(deltas, out=docs[1:])
                docs[1:] += first
        out_docs.append(docs)
        for f in range(num_fields):
            out_tfs[f].append(vals[j:j + n]); j += n
        for f in range(num_fields):
            out_lens[f].append(vals[j:j + n]); j += n
        i = j
    cat = np.concatenate
    docs = cat(out_docs) if out_docs else np.empty(0, np.uint64)
    tfs = [cat(x) if x else np.empty(0, np.uint64) for x in out_tfs]
    lens = [cat(x) if x else np.empty(0, np.uint64) for x in out_lens]
    occ = np.zeros(len(docs), dtype=np.uint64)
    for tf in tfs:
        occ += tf
    return docs, occ, tfs, lens


def encode_many(values: np.ndarray, boundaries: np.ndarray) -> list[bytes]:
    """Varint-encode one big value array and split the byte stream at
    ``boundaries`` (value indices), returning one ``bytes`` per segment.

    Used to encode all posting blocks of a batch in one vectorized pass.
    """
    a = np.ascontiguousarray(values, dtype=np.uint64)
    nb = varint_byte_lengths(a)
    byte_ends = np.cumsum(nb)
    raw = varint_encode(a)
    out = []
    prev = 0
    for b in boundaries:
        end = int(byte_ends[b - 1]) if b > 0 else 0
        out.append(raw[prev:end])
        prev = end
    return out
