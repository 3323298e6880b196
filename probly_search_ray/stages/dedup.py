"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes:
- exact: content-hash per batch (map_batches) → ``groupby(hash)`` →
  keep min doc_id per group.  The shuffle moves (hash, doc_id) pairs
  only — never the documents.
- MinHash-LSH: shingle→minhash per batch → explode to
  (band, band_hash, doc_id) rows → ``groupby`` band buckets →
  candidate pairs → exact-Jaccard verification.  Candidate volume is
  bounded by bucket sizes; hot buckets are capped (documented).
- SimHash: 64-bit signatures per batch; near-dup pairs = signatures at
  Hamming distance ≤ t within LSH buckets on bit-bands.
- embedding: cosine threshold pairs via block-matmul against a
  broadcast (ray.put) normalized matrix, or bucketed for large n.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from probly_search_ray.functions.hashing import (
    band_hashes, content_hash_hex, hash_tokens_u64, minhash_signatures,
    shingle_hashes)
from probly_search_ray.stages.textstats import _tokenize_flat


def add_content_hash(batch: pa.Table, text_col: str = "text") -> pa.Table:
    col = batch[text_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    hashes = content_hash_hex(col.to_numpy(zero_copy_only=False))
    return pa.table({"doc_id": batch["doc_id"],
                     "content_hash": pa.array(hashes, type=pa.string())})


def dedup_exact(docs_ds, text_col: str = "text"):
    """Survivor doc ids (min doc_id per identical text).  Returns a
    Dataset with a single ``doc_id`` column."""
    from ray.data.aggregate import Min
    hashed = docs_ds.map_batches(
        lambda b: add_content_hash(b, text_col), batch_format="pyarrow")
    return hashed.groupby("content_hash") \
                 .aggregate(Min("doc_id", alias_name="doc_id")) \
                 .select_columns(["doc_id"])


class MinHashStage:
    """map_batches: text → (doc_id, minhash signature, band hashes)."""

    def __init__(self, k: int = 128, bands: int = 16, w: int = 3,
                 seed: int = 1234, text_col: str = "text"):
        self.k, self.bands, self.w, self.seed = k, bands, w, seed
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, lens, _ = _tokenize_flat(batch, self.text_col)
        h = hash_tokens_u64(toks) if len(toks) else np.empty(0, np.uint64)
        sh, n_sh = shingle_hashes(h, lens, self.w)
        sig = minhash_signatures(sh, n_sh, self.k, self.seed)
        bh = band_hashes(sig, self.bands)
        doc_ids = batch["doc_id"].to_numpy()
        # docs with no shingles (shorter than w tokens) emit no band rows
        nz = n_sh > 0
        bh = bh[nz]
        doc_ids = doc_ids[nz]
        n = int(nz.sum())
        # int64 bit-pattern view: uint64 values above 2^63 make Ray's
        # shuffle-boundary conversion fall back noisily per block
        return pa.table({
            "band": pa.array(np.tile(np.arange(self.bands, dtype=np.int32), n)),
            "band_hash": pa.array(bh.reshape(-1).view(np.int64),
                                  type=pa.int64()),
            "doc_id": pa.array(np.repeat(doc_ids, self.bands)),
        })


def _combine_band_key(band: np.ndarray, band_hash: np.ndarray) -> np.ndarray:
    """(band, band_hash) → one well-mixed uint64 key (mod-2^64 mix), so
    collision membership is a single vectorized ``np.isin``."""
    with np.errstate(over="ignore"):
        return (band_hash.astype(np.uint64)
                * np.uint64(0x9E3779B97F4A7C15)
                + band.astype(np.uint64))


def lsh_candidate_pairs(docs_ds, k: int = 128, bands: int = 16, w: int = 3,
                        text_col: str = "text", max_bucket: int = 64):
    """Candidate near-dup pairs from MinHash LSH banding.
    Returns a pandas DataFrame of (a, b) doc-id pairs, a < b, deduped.

    Shape: the all-to-all work is ONE C-level count aggregate over
    (band, band_hash) keys; colliding-key membership is a vectorized
    ``np.isin`` against the (small) broadcast key array; pair expansion
    runs DISTRIBUTED inside ``groupby(bucket).map_groups`` (vectorized
    ``np.triu_indices`` per bucket), so the driver only ever sees the
    deduped candidate pairs — work is proportional to actual
    collisions, never to the corpus.  Buckets larger than
    ``max_bucket`` are truncated (hot boilerplate clusters need a
    dedicated pass)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Count

    bands_ds = docs_ds.map_batches(
        MinHashStage(k=k, bands=bands, w=w, text_col=text_col),
        batch_format="pyarrow")
    bands_mat = bands_ds.materialize()  # reused twice below
    counts = bands_mat.groupby(["band", "band_hash"]).aggregate(
        Count(alias_name="n"))
    dup_keys = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)),
        batch_format="pyarrow").to_pandas()
    if len(dup_keys) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64)})
    keys = np.sort(_combine_band_key(dup_keys["band"].to_numpy(),
                                     dup_keys["band_hash"].to_numpy()))
    keys_ref = __import__("ray").put(keys)

    def only_colliding(t: pa.Table) -> pa.Table:
        import ray as _ray
        ks = _ray.get(keys_ref)
        key = _combine_band_key(t["band"].to_numpy(),
                                t["band_hash"].to_numpy())
        idx = np.searchsorted(ks, key)
        idx = np.minimum(idx, len(ks) - 1)
        mask = ks[idx] == key
        # int64 view: uint64 keys above 2^63 trip the pandas→arrow
        # conversion inside map_groups (noisy fallback); the bit
        # pattern is all that matters for grouping
        return pa.table({"bucket": pa.array(key[mask].view(np.int64),
                                            type=pa.int64()),
                         "doc_id": t["doc_id"].filter(pa.array(mask))})

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())[:max_bucket]
        ii, jj = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ii].astype(np.int64),
                             "b": ids[jj].astype(np.int64)})

    pairs = bands_mat.map_batches(only_colliding, batch_format="pyarrow") \
        .groupby("bucket").map_groups(emit_pairs, batch_format="pandas") \
        .to_pandas()
    if "a" not in pairs.columns or not len(pairs):
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64)})
    return pairs.drop_duplicates(["a", "b"]).sort_values(["a", "b"]) \
        .reset_index(drop=True)


def jaccard_verify(docs_ds, pairs_df: pd.DataFrame, threshold: float,
                   w: int = 3, text_col: str = "text") -> pd.DataFrame:
    """Exact w-shingle Jaccard for candidate pairs.  The candidate doc
    set is filtered server-side and only those docs' shingle sets are
    collected (candidates ≪ corpus)."""
    if len(pairs_df) == 0:
        return pd.DataFrame({"a": pd.Series(dtype=np.int64),
                             "b": pd.Series(dtype=np.int64),
                             "jaccard": pd.Series(dtype=np.float64)})
    cand = np.unique(np.concatenate([pairs_df["a"].to_numpy(),
                                     pairs_df["b"].to_numpy()]))

    def only_cands(b: pa.Table) -> pa.Table:
        mask = np.isin(b["doc_id"].to_numpy(), cand)
        return b.filter(pa.array(mask))

    sets: dict[int, set] = {}
    sub = docs_ds.map_batches(only_cands, batch_format="pyarrow")
    for b in sub.iter_batches(batch_format="pyarrow"):
        toks, lens, didx = _tokenize_flat(b, text_col)
        h = hash_tokens_u64(toks) if len(toks) else np.empty(0, np.uint64)
        sh, n_sh = shingle_hashes(h, lens, w)
        starts = np.cumsum(n_sh) - n_sh
        ids = b["doc_id"].to_numpy()
        for i in range(len(ids)):
            sets[int(ids[i])] = set(
                sh[starts[i]:starts[i] + n_sh[i]].tolist())
    out = []
    for a, bb in zip(pairs_df["a"].to_numpy(), pairs_df["b"].to_numpy()):
        sa, sb = sets.get(int(a), set()), sets.get(int(bb), set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            out.append((int(a), int(bb), round(j, 6)))
    out.sort()
    return pd.DataFrame(out, columns=["a", "b", "jaccard"]) if out else \
        pd.DataFrame({"a": pd.Series(dtype=np.int64),
                      "b": pd.Series(dtype=np.int64),
                      "jaccard": pd.Series(dtype=np.float64)})


def near_dup_pairs(docs_ds, threshold: float = 0.8, k: int = 128,
                   bands: int = 16, w: int = 3, text_col: str = "text"):
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified."""
    cands = lsh_candidate_pairs(docs_ds, k=k, bands=bands, w=w,
                                text_col=text_col)
    return jaccard_verify(docs_ds, cands, threshold, w=w, text_col=text_col)
