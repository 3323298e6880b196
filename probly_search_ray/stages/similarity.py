"""Similarity search over an embedding column (``list<float>``).

- ``brute_topk``: exact cosine top-k — the query matrix is broadcast
  once (``ray.put``), each batch does one numpy matmul and emits only
  its tie-safe per-batch top-k rows (≤ (k + ties)·nq per batch), so the
  driver merge is bounded by k·nq·n_batches, never the corpus.
- ``ivf_topk``: scale path — deterministic k-means-lite centroids from
  a sample, assignment per batch, probe the closest ``nprobe``
  clusters only; same per-batch top-k truncation.
- ``embedding_near_dup_pairs``: EXACT cosine ≥ threshold pairs via a
  blocked cross product of object-store blocks (O(B²) tasks, streaming
  block reads, no whole-dataset materialization on the driver).
- ``bucketed_near_dup_pairs``: approximate scale path for HIGH
  thresholds — multi-probe IVF bucketing, pairs only within buckets
  (O(Σ bucket²) instead of O(n²)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _to_matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col
    if isinstance(arr, (pa.ListArray, pa.LargeListArray,
                        pa.FixedSizeListArray)):
        values = arr.values.to_numpy(zero_copy_only=False).astype(np.float32)
        if isinstance(arr, pa.FixedSizeListArray):
            dim = arr.type.list_size
        else:
            offsets = arr.offsets.to_numpy()
            dim = int(offsets[1] - offsets[0]) if len(arr) else 0
        return values.reshape(len(arr), dim)
    # tensor-extension / object column (e.g. from_pandas with ndarrays)
    m = arr.to_numpy(zero_copy_only=False)
    if m.dtype == object:
        m = np.stack(m)
    return np.asarray(m, dtype=np.float32)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _sample_key(ids: np.ndarray, seed: int) -> np.ndarray:
    """Seeded uniform rank for layout-invariant sampling: the rows with
    the smallest key form a deterministic pseudo-random sample that is
    independent of block layout and input order (``ds.limit()`` takes
    the FIRST rows — biased on sorted or time-ordered input)."""
    return pd.util.hash_array(np.ascontiguousarray(ids, dtype=np.uint64),
                              hash_key=f"{seed % 10**16:016d}")


def _hash_sample(emb_ds, id_col: str, vec_col: str, rows: int,
                 seed: int) -> np.ndarray:
    """Distributed seeded sample of ``rows`` vectors (float32 matrix,
    ascending sample-key order).  Each batch keeps only its ``rows``
    smallest keys, the reduced set (≤ rows·n_blocks) sorts by key, and
    the driver pulls exactly ``rows`` rows — never the corpus."""
    def part(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy()
        m32 = np.ascontiguousarray(_to_matrix(batch[vec_col]))
        h = _sample_key(ids, seed)
        if len(h) > rows:
            keep = np.argpartition(h, rows - 1)[:rows]
            h, m32 = h[keep], m32[keep]
        return pa.table({
            "h": pa.array(h.astype(np.uint64)),
            "vec_raw": pa.array([r.tobytes() for r in m32], pa.binary())})

    s = emb_ds.map_batches(part, batch_format="pyarrow") \
        .sort("h").limit(rows).to_pandas()
    return np.frombuffer(b"".join(s["vec_raw"]), dtype=np.float32) \
        .reshape(len(s), -1)


def _auto_clusters(n_rows: int, floor: int, target: int) -> int:
    """Cluster count ∝ corpus size (bounded EXPECTED cluster size):
    fixed k is a 100 TB scale-killer — one cluster grows as n/k, and
    any within-cluster pairwise work grows as (n/k)².  SemDedup
    (arXiv:2303.09540) uses k ≈ 0.1%·n for the same reason."""
    import math
    return max(floor, math.ceil(n_rows / max(target, 1)))


def _dup_flags_blocked(m: np.ndarray, threshold: float,
                       block: int = 2048) -> np.ndarray:
    """Keep-lowest-index duplicate flags over a normalized matrix whose
    rows are in ascending-id order: flag[i] ⇔ ∃ j < i with cosine ≥
    threshold.  Tiled matmuls bound peak memory at one block×block
    tile instead of an n×n boolean (the in-cluster pairwise step must
    stay bounded even on a skewed hot cluster)."""
    n = m.shape[0]
    dup = np.zeros(n, dtype=bool)
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        mi = m[i0:i1]
        for j0 in range(0, i0 + 1, block):
            j1 = min(j0 + block, n)
            hit = mi @ m[j0:j1].T >= threshold
            if j0 == i0:  # within-tile: only j < i counts
                hit = np.tril(hit, k=-1)
            dup[i0:i1] |= hit.any(axis=1)
    return dup


def _blocked_pairs(ids: np.ndarray, m: np.ndarray, threshold: float,
                   block: int = 2048, round_dp: int = 6):
    """All (a < b, cosine ≥ threshold) pairs within one normalized
    group, tiled so peak memory is one block×block similarity tile.
    ``ids`` must be ascending so index order ⇔ id order."""
    out_a, out_b, out_c = [], [], []
    n = len(ids)
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        mi = m[i0:i1]
        for j0 in range(i0, n, block):
            j1 = min(j0 + block, n)
            sims = mi @ m[j0:j1].T
            if j0 == i0:
                ii, jj = np.nonzero(np.triu(sims >= threshold, k=1))
            else:
                ii, jj = np.nonzero(sims >= threshold)
            if len(ii):
                out_a.append(ids[i0 + ii])
                out_b.append(ids[j0 + jj])
                out_c.append(np.round(sims[ii, jj], round_dp))
    if not out_a:
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64))
    return (np.concatenate(out_a).astype(np.int64),
            np.concatenate(out_b).astype(np.int64),
            np.concatenate(out_c).astype(np.float64))


def _topk_rows_per_query(sims: np.ndarray, k: int):
    """Tie-safe per-query top-k cut over a (n, nq) similarity matrix:
    keeps every row with sim >= the query's kth value, so a later
    global (cosine desc, id asc) sort is unaffected by the cut.
    Returns (row_idx, query_idx) of kept entries."""
    n, nq = sims.shape
    if n > k:
        kth = -np.partition(-sims, k - 1, axis=0)[k - 1]  # (nq,)
        mask = sims >= kth
    else:
        mask = np.ones_like(sims, dtype=bool)
    rows, qs = np.nonzero(mask)
    return rows, qs


class _BatchCosine:
    """Actor-pool stage: query matrix fetched from the object store
    once per actor (``ray.put`` broadcast), matmul per batch, per-batch
    tie-safe top-k — k rows per (batch, query) leave the stage."""

    def __init__(self, q_ref, id_col: str, vec_col: str, k: int):
        # float64 so 6-dp rounding is stable vs a double-precision oracle
        self.q = _normalize(ray.get(q_ref).astype(np.float64))  # (nq, dim)
        self.id_col, self.vec_col = id_col, vec_col
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_to_matrix(batch[self.vec_col]).astype(np.float64))
        sims = np.round(m @ self.q.T, 6)  # (n, nq); round BEFORE ranking
        ids = batch[self.id_col].to_numpy()
        rows, qs = _topk_rows_per_query(sims, self.k)
        return pa.table({
            "query_idx": pa.array(qs.astype(np.int32)),
            self.id_col: pa.array(ids[rows]),
            "cosine": pa.array(sims[rows, qs]),
        })


def _merge_topk(df: pd.DataFrame, k: int, id_col: str) -> pd.DataFrame:
    df = df.sort_values(["query_idx", "cosine", id_col],
                        ascending=[True, False, True], kind="stable")
    return df.groupby("query_idx", as_index=False).head(k) \
        .reset_index(drop=True)


def brute_topk(emb_ds, queries: np.ndarray, k: int = 10,
               id_col: str = "vec_id", vec_col: str = "embedding",
               concurrency=None):
    """Exact cosine top-k per query row.  Returns a pandas DataFrame
    (query_idx, id, cosine) with deterministic (cosine desc, id asc)
    order, cosine rounded to 6dp before ranking."""
    q_ref = ray.put(np.ascontiguousarray(queries, dtype=np.float32))
    from probly_search_ray.functions.sizing import auto_pool
    kwargs = {"concurrency": concurrency or auto_pool()}
    scored = emb_ds.map_batches(
        _BatchCosine, fn_constructor_args=(q_ref, id_col, vec_col, k),
        batch_format="pyarrow", **kwargs)
    # bounded merge: ≤ (k + ties)·nq rows per batch reach the driver
    return _merge_topk(scored.to_pandas(), k, id_col)


def kmeans_lite(sample: np.ndarray, n_clusters: int, iters: int = 8,
                seed: int = 5) -> np.ndarray:
    """Deterministic small k-means on a driver-side sample → centroids
    to broadcast.  (The scale path: sample via ds.random_sample.)"""
    rng = np.random.default_rng(seed)
    x = _normalize(sample.astype(np.float32))
    k = min(n_clusters, len(x))
    # deterministic farthest-first (k-center) init: seeds end up in
    # distinct natural clusters instead of wherever a uniform draw
    # lands, so Lloyd's converges to separated centroids reliably
    first = int(rng.integers(0, len(x)))
    idx = [first]
    d = 1.0 - x @ x[first]
    for _ in range(k - 1):
        j = int(np.argmax(d))
        idx.append(j)
        d = np.minimum(d, 1.0 - x @ x[j])
    c = x[np.asarray(idx)]
    for _ in range(iters):
        a = np.argmax(x @ c.T, axis=1)
        for j in range(len(c)):
            m = x[a == j]
            if len(m):
                c[j] = m.mean(axis=0)
        c = _normalize(c)
    return c


def kmeans_full(emb_ds, n_clusters: int = 8, iters: int = 5, seed: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                sample_rows: int = 2048):
    """Distributed spherical k-means over the WHOLE dataset (Lloyd's):
    each iteration is one ``map_batches`` pass that emits per-cluster
    partial sums (≤ k rows of (cluster, n, float64-sum bytes) per
    batch), merged on the driver into new centroids — the driver never
    sees vectors, only k·n_batches tiny partial rows per iteration.
    At 100 TB each iteration re-streams the parquet input; no
    materialization anywhere.

    Deterministic: init from ``kmeans_lite`` on a fixed sample, and the
    driver merge sums partials in (cluster, batch-min-id) order, so the
    result is independent of task scheduling order.

    Returns (centroids float32 (k, dim), assign_fn) where assign_fn is
    a map_batches-ready callable emitting (id_col, cluster, cosine)."""
    sample_rows = max(sample_rows, 2 * n_clusters)
    sm = _hash_sample(emb_ds, id_col, vec_col, sample_rows, seed)
    cents = kmeans_lite(sm, n_clusters, seed=seed).astype(np.float64)
    dim = cents.shape[1]

    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(batch: pa.Table, _c_ref=c_ref) -> pa.Table:
            c = ray.get(_c_ref)
            m = _normalize(_to_matrix(batch[vec_col]).astype(np.float64))
            a = np.argmax(m @ c.T, axis=1)
            ids = batch[id_col].to_numpy()
            lo = np.int64(ids.min()) if len(ids) else np.int64(0)
            o = np.argsort(a, kind="stable")
            a_s = a[o]
            st = np.flatnonzero(np.concatenate(([True], a_s[1:] != a_s[:-1])))
            sums = np.add.reduceat(m[o], st, axis=0)
            n = np.diff(np.concatenate((st, [len(a_s)])))
            return pa.table({
                "cluster": pa.array(a_s[st].astype(np.int32)),
                "n": pa.array(n.astype(np.int64)),
                "lo": pa.array(np.full(len(st), lo)),
                "vsum": pa.array([r.tobytes() for r in sums], pa.binary())})

        parts = emb_ds.map_batches(partial, batch_format="pyarrow") \
            .to_pandas().sort_values(["cluster", "lo"], kind="stable")
        new = cents.copy()
        for cl, g in parts.groupby("cluster", sort=True):
            mat = np.frombuffer(b"".join(g["vsum"]), np.float64) \
                .reshape(len(g), dim)
            s = mat.sum(axis=0)
            if g["n"].sum() > 0:
                new[cl] = s  # empty clusters keep their old centroid
        new = _normalize(new)
        if np.array_equal(new, cents):
            # exact fixed point: assignments can't change, so every
            # remaining iteration is a bitwise no-op — stop paying a
            # full corpus pass per skipped iteration (result identical
            # to running all `iters`)
            break
        cents = new

    c_final = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(c_final)
        m = _normalize(_to_matrix(batch[vec_col]).astype(np.float64))
        sims = m @ c.T
        a = np.argmax(sims, axis=1)
        return pa.table({
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int32)),
            "cosine": pa.array(np.round(sims[np.arange(len(a)), a], 6))})

    return cents.astype(np.float32), assign


def kmeans_cluster_stats(emb_ds, n_clusters: int = 8, iters: int = 5,
                         seed: int = 5, id_col: str = "vec_id",
                         vec_col: str = "embedding"):
    """→ pandas (cluster, n_vectors, mean_cosine): per-cluster sizes and
    mean cosine-to-centroid after a full distributed k-means — the
    partial-aggregate shape again (per-batch (cluster, n, sum_cos)
    rows, tiny driver merge)."""
    _, assign = kmeans_full(emb_ds, n_clusters, iters, seed,
                            id_col=id_col, vec_col=vec_col)

    def partial(batch: pa.Table) -> pa.Table:
        t = assign(batch)
        a = t["cluster"].to_numpy()
        cos = t["cosine"].to_numpy()
        o = np.argsort(a, kind="stable")
        a_s, c_s = a[o], cos[o]
        st = np.flatnonzero(np.concatenate(([True], a_s[1:] != a_s[:-1])))
        return pa.table({
            "cluster": pa.array(a_s[st]),
            "n": pa.array(np.diff(np.concatenate(
                (st, [len(a_s)]))).astype(np.int64)),
            "sum_cos": pa.array(np.add.reduceat(c_s, st))})

    parts = emb_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("cluster", as_index=False).agg(
        n_vectors=("n", "sum"), sum_cos=("sum_cos", "sum"))
    g["mean_cosine"] = (g["sum_cos"] / g["n_vectors"]).round(4)
    return g[["cluster", "n_vectors", "mean_cosine"]] \
        .sort_values("cluster").reset_index(drop=True)


def semantic_dedup_drop_ids(emb_ds, n_clusters: int = 8, iters: int = 5,
                            threshold: float = 0.95, seed: int = 5,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            target_cluster: int = 1024,
                            block: int = 2048) -> np.ndarray:
    """SemDedup-style semantic deduplication (cluster-then-prune, after
    Abbas et al. 2023, arXiv:2303.09540): full-corpus spherical k-means
    (``kmeans_full``), then WITHIN each cluster drop every vector that
    has a lower-id vector at cosine ≥ threshold (deterministic
    keep-lowest-id rule).  Scale shape: the cluster count grows with
    the corpus (``max(n_clusters, ceil(n / target_cluster))`` — bounded
    EXPECTED cluster size, the paper's k ∝ n), and the within-cluster
    pairwise step is TILED (``_dup_flags_blocked``) so one skewed hot
    cluster costs one block×block tile of memory, never (n/k)².
    O(Σ cluster²) compute instead of O(n²); recall < 1 only when a
    near-dup pair straddles a cluster boundary (gated by the
    planted-pair pytest).  Returns the sorted dropped-id array —
    O(#dups), small enough to broadcast as a filter."""
    n_clusters = _auto_clusters(emb_ds.count(), n_clusters, target_cluster)
    cents, _ = kmeans_full(emb_ds, n_clusters, iters, seed,
                           id_col=id_col, vec_col=vec_col)
    c_ref = ray.put(cents.astype(np.float64))

    class _AssignVec:
        def __init__(self):
            self.c = ray.get(c_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m32 = _to_matrix(batch[vec_col])
            m = _normalize(m32.astype(np.float64))
            a = np.argmax(m @ self.c.T, axis=1)
            n, dim = m32.shape
            vec_bytes = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(4 * dim), n,
                [None, pa.py_buffer(np.ascontiguousarray(m32).tobytes())])
            return pa.table({"cluster": pa.array(a.astype(np.int32)),
                             id_col: batch[id_col],
                             "vec_raw": vec_bytes})

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.frombuffer(b"".join(g["vec_raw"]), dtype=np.float32) \
            .reshape(len(g), -1)[order]
        m = _normalize(m.astype(np.float64))
        dup = _dup_flags_blocked(m, threshold, block=block)
        return pd.DataFrame({id_col: ids[dup].astype(np.int64)})

    from probly_search_ray.functions.sizing import auto_pool
    drops = emb_ds.map_batches(_AssignVec, batch_format="pyarrow",
                               concurrency=auto_pool()) \
        .groupby("cluster").map_groups(prune, batch_format="pandas") \
        .to_pandas()
    if id_col not in drops.columns:
        return np.empty(0, np.int64)
    return np.sort(drops[id_col].to_numpy(np.int64))


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10, n_clusters: int = 16,
             nprobe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", sample_rows: int = 2048):
    """IVF-style ANN: centroid assignment per batch, score only vectors
    in the ``nprobe`` clusters closest to each query; per-batch tie-safe
    top-k truncation keeps the driver merge bounded by k·nq·n_batches."""
    sm = _hash_sample(emb_ds, id_col, vec_col,
                      max(sample_rows, 2 * n_clusters), seed=5)
    cents = kmeans_lite(sm, n_clusters)
    c_ref = ray.put(cents)
    qn = _normalize(np.ascontiguousarray(queries, dtype=np.float64))
    probe = np.argsort(-(qn @ cents.T.astype(np.float64)), axis=1)[:, :nprobe]
    probe_lists = [np.asarray(sorted(p.tolist())) for p in probe]
    q_ref = ray.put(qn)

    class _IVF:
        def __init__(self):
            self.c = ray.get(c_ref)
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(batch[vec_col]).astype(np.float64))
            assign = np.argmax(m @ self.c.T.astype(np.float64), axis=1)
            ids = batch[id_col].to_numpy()
            out_q, out_i, out_c = [], [], []
            for qi, plist in enumerate(probe_lists):
                mask = np.isin(assign, plist)
                if not mask.any():
                    continue
                sims = np.round(m[mask] @ self.q[qi], 6)
                if len(sims) > k:  # tie-safe per-batch top-k
                    kth = -np.partition(-sims, k - 1)[k - 1]
                    keep = sims >= kth
                    sims = sims[keep]
                    sel_ids = ids[mask][keep]
                else:
                    sel_ids = ids[mask]
                out_q.append(np.full(len(sims), qi, dtype=np.int32))
                out_i.append(sel_ids)
                out_c.append(sims)
            if not out_q:
                return pa.table({"query_idx": pa.array([], pa.int32()),
                                 id_col: pa.array([], pa.int64()),
                                 "cosine": pa.array([], pa.float64())})
            return pa.table({"query_idx": pa.array(np.concatenate(out_q)),
                             id_col: pa.array(np.concatenate(out_i)),
                             "cosine": pa.array(np.concatenate(out_c))})

    from probly_search_ray.functions.sizing import auto_pool
    scored = emb_ds.map_batches(_IVF, batch_format="pyarrow",
                                concurrency=auto_pool())
    return _merge_topk(scored.to_pandas(), k, id_col)


@ray.remote
def _pair_block(blk_a, blk_b, threshold: float, same: bool, round_dp: int):
    """Cosine-pair search between two id/matrix blocks (one task of the
    blocked cross product)."""
    ia, ma = blk_a
    ib, mb = blk_b
    sims = ma @ mb.T
    ii, jj = np.nonzero(sims >= threshold)
    a, b = ia[ii], ib[jj]
    cos = np.round(sims[ii, jj], round_dp)
    if same:
        keep = a < b
        a, b, cos = a[keep], b[keep], cos[keep]
    else:  # normalize unordered pair to (min, max)
        a, b = np.minimum(a, b), np.maximum(a, b)
    return a, b, cos


def embedding_near_dup_pairs(emb_ds, threshold: float = 0.95,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             block_rows: int = 8192, round_dp: int = 6):
    """EXACT cosine-similar pairs (a < b, cosine ≥ threshold).

    Blocked cross product: the dataset streams through the driver once
    as normalized (ids, matrix) blocks pinned in the object store; one
    Ray task per block pair (i ≤ j) emits only matching pairs.  Compute
    is inherently O(n²/2) for exact all-pairs, but memory per task is
    one block pair and the driver holds only refs + result pairs —
    no whole-dataset materialization.  For high thresholds at scale,
    prefer ``bucketed_near_dup_pairs``."""
    refs = []
    for b in emb_ds.select_columns([id_col, vec_col]).iter_batches(
            batch_format="pyarrow", batch_size=block_rows):
        ids = b[id_col].to_numpy()
        m = _normalize(_to_matrix(b[vec_col]).astype(np.float64))
        refs.append(ray.put((ids, m)))
    futs = [_pair_block.remote(refs[i], refs[j], threshold, i == j,
                               round_dp)
            for i in range(len(refs)) for j in range(i, len(refs))]
    parts = ray.get(futs)
    if parts:
        a = np.concatenate([p[0] for p in parts])
        b = np.concatenate([p[1] for p in parts])
        cos = np.concatenate([p[2] for p in parts])
    else:
        a = b = np.empty(0, np.int64)
        cos = np.empty(0, np.float64)
    out = pd.DataFrame({"a": a.astype(np.int64), "b": b.astype(np.int64),
                        "cosine": cos.astype(np.float64)})
    return out.sort_values(["a", "b"]).reset_index(drop=True)


def bucketed_near_dup_pairs(emb_ds, threshold: float = 0.95,
                            n_clusters: int = 16, n_probe: int = 3,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding",
                            sample_rows: int = 2048,
                            target_bucket: int = 1024,
                            block: int = 2048):
    """Approximate near-dup pairs for HIGH thresholds at scale: assign
    each vector to its ``n_probe`` nearest IVF clusters (multi-probe, so
    near-identical vectors landing near a cluster boundary still share
    a bucket), generate pairs only within buckets via a distributed
    ``groupby(bucket).map_groups``, dedupe, then exact-verify the
    cosine.  Scale shape: the bucket count grows with the corpus
    (``max(n_clusters, ceil(n / target_bucket))`` — parallelism and
    per-bucket size both bounded, not a fixed 16-way ceiling), and the
    in-bucket all-pairs step is TILED (``_blocked_pairs``) so a skewed
    hot bucket costs one block×block tile of memory.  O(Σ bucket²)
    compute instead of O(n²); recall < 1 only when two vectors at
    cosine ≥ threshold share none of their ``n_probe`` nearest
    centroids (vanishingly rare for thresholds near 1 — gated by the
    planted-dup recall test)."""
    n_clusters = _auto_clusters(emb_ds.count(), n_clusters, target_bucket)
    sm = _hash_sample(emb_ds, id_col, vec_col,
                      max(sample_rows, 2 * n_clusters), seed=5)
    cents = kmeans_lite(sm, n_clusters)
    c_ref = ray.put(cents)

    class _Assign:
        """Vectors ride the bucket shuffle as fixed-size binary (raw
        float32 bytes) — plain binary columns shuffle through any sort
        backend, unlike tensor-extension/list columns."""

        def __init__(self):
            self.c = ray.get(c_ref).astype(np.float64)

        def __call__(self, batch: pa.Table) -> pa.Table:
            m32 = _to_matrix(batch[vec_col])
            m = _normalize(m32.astype(np.float64))
            sims = m @ self.c.T
            p = min(n_probe, sims.shape[1])
            near = np.argpartition(-sims, p - 1, axis=1)[:, :p]  # (n, p)
            ids = batch[id_col].to_numpy()
            n, dim = m32.shape
            idx = np.repeat(np.arange(n), p)
            flat = np.ascontiguousarray(m32[idx])
            vec_bytes = pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(4 * dim), len(idx),
                [None, pa.py_buffer(flat.tobytes())])
            return pa.table({
                "bucket": pa.array(near.reshape(-1).astype(np.int32)),
                id_col: pa.array(ids[idx]),
                "vec_raw": vec_bytes,
            })

    def emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        m = np.frombuffer(b"".join(g["vec_raw"]), dtype=np.float32) \
            .reshape(len(g), -1)[order]
        m = _normalize(m.astype(np.float64))
        a, b, cos = _blocked_pairs(ids, m, threshold, block=block)
        return pd.DataFrame({"a": a, "b": b, "cosine": cos})

    from probly_search_ray.functions.sizing import auto_pool
    pairs = emb_ds.map_batches(_Assign, batch_format="pyarrow",
                               concurrency=auto_pool()) \
        .groupby("bucket").map_groups(emit_pairs, batch_format="pandas")
    out = pairs.to_pandas()
    if "a" not in out.columns:
        out = pd.DataFrame({"a": pd.Series(dtype=np.int64),
                            "b": pd.Series(dtype=np.int64),
                            "cosine": pd.Series(dtype=np.float64)})
    # a pair can collide in up to n_probe shared buckets → dedupe
    out = out.drop_duplicates(["a", "b"]).sort_values(["a", "b"])
    return out.reset_index(drop=True)
