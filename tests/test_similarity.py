"""Similarity-search stages: exactness of the blocked pair search and
per-batch top-k, recall gates for the approximate (IVF) paths with
PLANTED near-duplicates."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from probly_search_ray.stages.similarity import (
    brute_topk, bucketed_near_dup_pairs, embedding_near_dup_pairs,
    ivf_topk, _normalize)


def _vectors(seed=3, n=400, dim=32):
    rng = np.random.default_rng(seed)
    m = rng.normal(size=(n, dim))
    # planted near-dups: 4 pairs at cosine ~0.999
    for i, j in [(0, 300), (1, 301), (2, 302), (3, 303)]:
        m[j] = m[i] + rng.normal(scale=0.02, size=dim)
    return m


@pytest.fixture()
def emb_ds(ray_session):
    m = _vectors()
    df = pd.DataFrame({"vec_id": np.arange(len(m), dtype=np.int64),
                       "embedding": [row.astype(np.float32) for row in m]})
    return rd.from_pandas(df).repartition(6), m


def _numpy_pairs(m, tau):
    mn = _normalize(m.astype(np.float64))
    sims = mn @ mn.T
    ii, jj = np.nonzero(np.triu(sims >= tau, k=1))
    return set(zip(ii.tolist(), jj.tolist()))


def test_blocked_near_dup_exact(emb_ds):
    """Blocked cross product == brute-force numpy at any threshold."""
    ds, m = emb_ds
    for tau in (0.999, 0.5, 0.2):
        got = embedding_near_dup_pairs(ds, threshold=tau, block_rows=64)
        want = _numpy_pairs(m, tau)
        assert set(zip(got["a"], got["b"])) == want, tau


def test_bucketed_near_dup_recall(emb_ds):
    """Multi-probe IVF bucketing finds every planted high-cosine pair
    and introduces no false positives (pairs are exact-verified)."""
    ds, m = emb_ds
    got = bucketed_near_dup_pairs(ds, threshold=0.99, n_clusters=8,
                                  n_probe=3)
    pairs = set(zip(got["a"], got["b"]))
    assert pairs == _numpy_pairs(m, 0.99)
    assert {(0, 300), (1, 301), (2, 302), (3, 303)} <= pairs


def test_brute_topk_exact(emb_ds):
    """Per-batch tie-safe truncation == full numpy ranking."""
    ds, m = emb_ds
    q = m[:3]
    got = brute_topk(ds, q, k=7)
    mn = _normalize(m.astype(np.float64))
    qn = _normalize(q.astype(np.float64))
    sims = np.round(mn @ qn.T, 6)
    for qi in range(3):
        order = np.lexsort((np.arange(len(m)), -sims[:, qi]))[:7]
        sub = got[got["query_idx"] == qi]
        assert list(sub["vec_id"]) == list(order), qi
        np.testing.assert_allclose(sub["cosine"], sims[order, qi])


def test_ivf_topk_recall(emb_ds):
    """IVF ANN recall@10 >= 0.9 vs brute force on the same queries."""
    ds, m = emb_ds
    q = m[:5]
    brute = brute_topk(ds, q, k=10)
    # random gaussian vectors are the IVF worst case (no cluster
    # structure) — probe 6/8 clusters for the recall gate
    ivf = ivf_topk(ds, q, k=10, n_clusters=8, nprobe=6)
    recalls = []
    for qi in range(5):
        b = set(brute[brute["query_idx"] == qi]["vec_id"])
        a = set(ivf[ivf["query_idx"] == qi]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert np.mean(recalls) >= 0.9, recalls


@pytest.mark.usefixtures("ray_session")
def test_kmeans_full_differential():
    """Distributed Lloyd's == driver-side numpy Lloyd's with the same
    deterministic init, and the result is block-layout ROBUST (partial
    sums merge in a scheduling-independent order; float re-association
    across batch boundaries must not move counts on separated data)."""
    from probly_search_ray.stages.similarity import (
        kmeans_cluster_stats, kmeans_lite, _normalize)
    rng = np.random.default_rng(11)
    k, dim, per = 4, 16, 300
    centers = _normalize(rng.normal(size=(k, dim)))
    x = np.repeat(centers, per, axis=0) + 0.05 * rng.normal(
        size=(k * per, dim))
    df = pd.DataFrame({"vec_id": np.arange(len(x), dtype=np.int64),
                       "embedding": [r.astype(np.float32) for r in x]})

    # driver-side reference: identical algorithm, single process.
    # Init mirrors _hash_sample: all 1200 rows (< sample_rows) ordered
    # by the seeded per-id hash key, exactly what kmeans_full sees.
    from probly_search_ray.stages.similarity import _sample_key
    xn = _normalize(np.stack(df["embedding"].to_numpy()).astype(np.float64))
    h = _sample_key(df["vec_id"].to_numpy(), 5)
    sm = np.stack(df["embedding"].to_numpy())[np.argsort(h, kind="stable")]
    c = kmeans_lite(sm.astype(np.float32), 4, seed=5).astype(np.float64)
    for _ in range(5):
        a = np.argmax(xn @ c.T, axis=1)
        new = c.copy()
        for j in range(4):
            if (a == j).any():
                new[j] = xn[a == j].sum(axis=0)
        c = _normalize(new)
    a = np.argmax(xn @ c.T, axis=1)
    want = pd.Series(a).value_counts().sort_index()

    outs = []
    for nblocks in (1, 6):
        ds = rd.from_pandas(df).repartition(nblocks)
        got = kmeans_cluster_stats(ds, n_clusters=4, iters=5)
        assert list(got["cluster"]) == sorted(got["cluster"])
        assert got["n_vectors"].sum() == len(x)
        outs.append(got)
        assert list(got["n_vectors"]) == list(want.to_numpy())
        # members are near their center on this separated data
        assert (got["mean_cosine"] > 0.9).all()
    pd.testing.assert_frame_equal(outs[0], outs[1])


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_planted():
    """SemDedup gate: every planted near-identical pair loses exactly
    its higher id; no unrelated vector is dropped at cosine ≥ 0.99."""
    from probly_search_ray.stages.similarity import semantic_dedup_drop_ids
    m = _vectors()  # 4 planted pairs: (0,300)..(3,303) at ~0.999
    df = pd.DataFrame({"vec_id": np.arange(len(m), dtype=np.int64),
                       "embedding": [r.astype(np.float32) for r in m]})
    for nblocks in (1, 4):
        drops = semantic_dedup_drop_ids(
            rd.from_pandas(df).repartition(nblocks),
            n_clusters=6, iters=4, threshold=0.99)
        assert list(drops) == [300, 301, 302, 303], nblocks


def test_blocked_kernels_match_naive():
    """The tiled pairwise kernels (bounded per-task memory — the 100 TB
    shape for in-cluster pair work) agree with the one-shot n×n matmul
    for every tiling, including block sizes that don't divide n."""
    from probly_search_ray.stages.similarity import (
        _blocked_pairs, _dup_flags_blocked, _normalize)
    rng = np.random.default_rng(3)
    m = _normalize(rng.normal(size=(500, 8)))
    m[100], m[499] = m[10], m[10]
    m = _normalize(m)
    sims = m @ m.T
    ids = np.arange(1000, 1500)
    for t in (0.5, 0.9, 0.999):
        naive_dup = np.triu(sims >= t, k=1).any(axis=0)
        ii, jj = np.nonzero(np.triu(sims >= t, k=1))
        for blk in (7, 64, 1000):
            assert (_dup_flags_blocked(m, t, block=blk) == naive_dup).all()
            a, b, c = _blocked_pairs(ids, m, t, block=blk)
            o = np.lexsort((b, a))
            assert (a[o] == ids[ii]).all() and (b[o] == ids[jj]).all()
            assert np.allclose(c[o], np.round(sims[ii, jj], 6))


@pytest.mark.usefixtures("ray_session")
def test_semantic_dedup_skew_bounded():
    """Scale gates for semantic dedup: (a) the cluster count grows with
    the corpus (bounded expected cluster size — never a fixed-k
    (n/k)² cliff), and (b) a maximally-skewed corpus (every vector
    near-identical → ONE hot cluster) still dedups exactly through the
    tiled kernel with a tiny block, proving per-tile memory — not
    cluster size — is the peak."""
    from probly_search_ray.stages.similarity import (
        _auto_clusters, _normalize, semantic_dedup_drop_ids)
    assert _auto_clusters(100, 8, 1024) == 8
    assert _auto_clusters(10_000_000, 8, 1024) == 9766
    assert _auto_clusters(10**9, 8, 1024) == 976563

    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    m = _normalize(base + 1e-4 * rng.normal(size=(4000, 16)))
    df = pd.DataFrame({"vec_id": np.arange(len(m), dtype=np.int64),
                       "embedding": [r.astype(np.float32) for r in m]})
    drops = semantic_dedup_drop_ids(
        rd.from_pandas(df).repartition(4), n_clusters=4, iters=2,
        threshold=0.99, block=256)
    # all rows are mutual near-dups: within each of the ≤4 clusters
    # exactly the min id survives, so ≥ 3996 of 4000 drop (near-ident
    # vectors may split across clusters on the 1e-4 noise — the
    # documented boundary-straddle recall loss, never a wrong drop)
    assert len(drops) >= 3996
    assert 0 not in drops
    assert set(drops) <= set(range(1, 4000))
