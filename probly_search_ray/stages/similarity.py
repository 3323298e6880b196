"""Similarity search over an embedding column (``list<float>``).

- ``brute_topk``: exact cosine top-k — the query matrix is broadcast
  once (``ray.put``), each batch does one numpy matmul, per-batch
  top-k candidates are reduced on the driver (k rows per batch, tiny).
- ``ivf_topk``: scale path — deterministic k-means-lite centroids from
  a sample, assignment per batch, probe the closest ``nprobe``
  clusters only.  Exact within probed clusters.
- ``embedding_near_dup_pairs``: cosine ≥ threshold near-dup pairs.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa

import ray


def _to_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col
    values = arr.values.to_numpy(zero_copy_only=False).astype(np.float32)
    offsets = arr.offsets.to_numpy()
    dim = int(offsets[1] - offsets[0]) if len(arr) else 0
    return values.reshape(len(arr), dim)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class _BatchCosine:
    """Actor-pool stage: query matrix fetched from the object store
    once per actor (``ray.put`` broadcast), matmul per batch."""

    def __init__(self, q_ref, id_col: str, vec_col: str):
        # float64 so 6-dp rounding is stable vs a double-precision oracle
        self.q = _normalize(ray.get(q_ref).astype(np.float64))  # (nq, dim)
        self.id_col, self.vec_col = id_col, vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]).astype(np.float64))
        sims = m @ self.q.T  # (n, nq)
        ids = batch[self.id_col].to_numpy()
        nq = sims.shape[1]
        return pa.table({
            "query_idx": pa.array(np.repeat(np.arange(nq, dtype=np.int32),
                                            len(ids))),
            self.id_col: pa.array(np.tile(ids, nq)),
            "cosine": pa.array(np.round(sims.T.reshape(-1).astype(np.float64), 6)),
        })


def brute_topk(emb_ds, queries: np.ndarray, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               concurrency: int = 2):
    """Exact cosine top-k per query row.  Returns a pandas DataFrame
    (query_idx, id, cosine) with deterministic (cosine desc, id asc)
    order, cosine rounded to 6dp before ranking."""
    q_ref = ray.put(np.ascontiguousarray(queries, dtype=np.float32))
    kwargs = {"concurrency": concurrency} if concurrency else {}
    scored = emb_ds.map_batches(
        _BatchCosine, fn_constructor_args=(q_ref, id_col, vec_col),
        batch_format="pyarrow", **kwargs)
    # streaming top-k reduce on the driver: keep a heap per query
    heaps: dict[int, list] = {}
    for b in scored.iter_batches(batch_format="pyarrow"):
        qi = b["query_idx"].to_numpy()
        ids = b[id_col].to_numpy()
        cos = b["cosine"].to_numpy()
        for q in np.unique(qi):
            sel = qi == q
            h = heaps.setdefault(int(q), [])
            for i, c in zip(ids[sel], cos[sel]):
                item = (c, -int(i))  # cosine asc, id desc → min-heap keeps top-k
                if len(h) < k:
                    heapq.heappush(h, item)
                elif item > h[0]:
                    heapq.heapreplace(h, item)
    import pandas as pd
    rows = []
    for q in sorted(heaps):
        for c, negi in sorted(heaps[q], key=lambda t: (-t[0], -t[1])):
            rows.append((q, -negi, c))
    return pd.DataFrame(rows, columns=["query_idx", id_col, "cosine"])


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8,
                seed: int = 5) -> np.ndarray:
    """Deterministic small k-means on a driver-side sample → centroids
    to broadcast.  (The scale path: sample via ds.random_sample.)"""
    rng = np.random.default_rng(seed)
    x = _normalize(sample.astype(np.float32))
    idx = rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)
    c = x[np.sort(idx)]
    for _ in range(iters):
        a = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = x[a == j]
            if len(m):
                c[j] = m.mean(axis=0)
        c = _normalize(c)
    return c


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", sample_rows: int = 2048):
    """IVF-style ANN: centroid assignment per batch, score only vectors
    in the ``nprobe`` clusters closest to each query."""
    sample = emb_ds.limit(sample_rows).to_pandas()[vec_col]
    sm = np.stack(sample.to_numpy())
    cents = kmeans_lite(sm, n_clusters)
    c_ref = ray.put(cents)
    qn = _normalize(np.ascontiguousarray(queries, dtype=np.float32))
    probe = np.argsort(-(qn @ cents.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    probe_sets = [set(p.tolist()) for p in probe]
    q_ref = ray.put(qn)

    class _IVF:
        def __init__(self):
            self.c = ray.get(c_ref)
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(batch[vec_col]))
            assign = np.argmax(m @ self.c.T, axis=1)
            ids = batch[id_col].to_numpy()
            out_q, out_i, out_c = [], [], []
            for qi, pset in enumerate(probe_sets):
                mask = np.isin(assign, list(pset))
                if not mask.any():
                    continue
                sims = m[mask] @ self.q[qi]
                out_q.append(np.full(mask.sum(), qi, dtype=np.int32))
                out_i.append(ids[mask])
                out_c.append(np.round(sims.astype(np.float64), 6))
            if not out_q:
                return pa.table({"query_idx": pa.array([], pa.int32()),
                                 id_col: pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.table({"query_idx": pa.array(np.concatenate(out_q)),
                             id_col: pa.array(np.concatenate(out_i)),
                             "cosine": pa.array(np.concatenate(out_c))})

    scored = emb_ds.map_batches(_IVF, batch_format="pyarrow", concurrency=2)
    df = scored.to_pandas()
    df = df.sort_values(["query_idx", "cosine", id_col],
                        ascending=[True, False, True])
    return df.groupby("query_idx", as_index=False).head(k).reset_index(drop=True)


def embedding_near_dup_pairs(emb_ds, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding"):
    """Cosine-similar pairs (a < b, cosine ≥ threshold).  In-memory
    matmul per batch against the full (broadcast) matrix — the sandbox
    path; at scale, bucket by IVF cluster first."""
    tbl = emb_ds.to_pandas()
    ids = tbl[id_col].to_numpy()
    m = _normalize(np.stack(tbl[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((ids, m))

    def block(batch: pa.Table) -> pa.Table:
        all_ids, all_m = ray.get(ref)
        bm = _normalize(_to_matrix(batch[vec_col]).astype(np.float64))
        bids = batch[id_col].to_numpy()
        sims = bm @ all_m.T
        ii, jj = np.nonzero(sims >= threshold)
        a, b = bids[ii], all_ids[jj]
        keep = a < b
        return pa.table({"a": pa.array(a[keep]), "b": pa.array(b[keep]),
                         "cosine": pa.array(
                             np.round(sims[ii, jj][keep].astype(np.float64), 6))})

    out = emb_ds.map_batches(block, batch_format="pyarrow").to_pandas()
    if "a" not in out.columns:  # zero matching pairs → typed empty frame
        import pandas as pd
        out = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                            "b": pd.Series(dtype=np.int64),
                            "cosine": pd.Series(dtype=np.float64)})
    return out.sort_values(["a", "b"]).reset_index(drop=True)
