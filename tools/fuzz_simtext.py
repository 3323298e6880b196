"""Randomized differential fuzz for the SIMILARITY / near-dup
operators — embedding brute top-k, exact blocked cosine pairs,
bucketed (IVF multi-probe) cosine pairs, MinHash-LSH near-dup pairs
and the standalone exact-Jaccard verifier — vs pure-numpy / pure-
Python brute force on random small inputs.

Boundary conditions the fixed testdata cannot reach: block_rows
smaller than the corpus (multi-block cross products, same-block vs
cross-block dedup), planted EXACT duplicate vectors (recall through
multi-probe bucketing is guaranteed for them: identical vectors get
identical bucket sets), k ≥ n, docs shorter than the shingle width
(empty sets must never match), duplicate texts in groups (LSH banding
must always co-bucket identical signatures), and candidate pairs
referencing docs with nothing in common.

Float discipline: where a comparison could sit on a rounding/threshold
boundary due to differing matmul association orders (BLAS shapes
differ between blocked and whole-matrix paths), the comparator accepts
a symmetric difference only for pairs whose exact cosine is within
1e-9 of the threshold, and top-k membership is checked against the
kth value with a 2e-6 (2 rounding ulps) band — the ADVICE-r4 pattern:
never demand bit-identical ranking across differently-ordered sums.
Jaccard comparisons are exact (integer ratios on both sides).

Run from the repo root:  FUZZ_SEEDS=60 python tools/fuzz_simtext.py
(owns its Ray session, like bench.py / the other tools/ harnesses).
"""
import os
import sys
import time
import traceback

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from probly_search_ray.stages.dedup import (  # noqa: E402
    jaccard_verify, lsh_candidate_pairs, near_dup_pairs)
from probly_search_ray.stages.similarity import (  # noqa: E402
    _normalize, brute_topk, bucketed_near_dup_pairs,
    embedding_near_dup_pairs)

N_SEEDS = int(os.environ.get("FUZZ_SEEDS", "60"))
START = int(os.environ.get("FUZZ_START", "30000"))


# ---------------------------------------------------------------- vectors

def _emb_table(rng, with_dups: bool):
    """Random embedding table; optionally plants exact-duplicate rows.
    Returns (pa.Table, ids ndarray, normalized float64 matrix,
    planted_pairs set of (lo, hi))."""
    n = int(rng.integers(4, 70))
    dim = int(rng.integers(3, 17))
    m = rng.normal(size=(n, dim)).astype(np.float32)
    planted = set()
    if with_dups and n >= 6:
        for _ in range(int(rng.integers(1, 4))):
            i, j = rng.choice(n, size=2, replace=False)
            m[j] = m[i]                      # exact copy
    ids = rng.permutation(np.arange(1, n + 1)).astype(np.int64)
    mn = _normalize(m.astype(np.float64))
    if with_dups:
        sims = mn @ mn.T
        ii, jj = np.nonzero(np.isclose(sims, 1.0, atol=1e-12))
        for a, b in zip(ii, jj):
            if a < b:
                planted.add((int(min(ids[a], ids[b])),
                             int(max(ids[a], ids[b]))))
    t = pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(m.reshape(-1)), dim),
    })
    return t, ids, mn, planted


def _all_sims(ids, mn):
    """Every unordered pair's exact float64 whole-matrix cosine (same
    normalize chain as the engine) — id-keyed, (lo, hi)."""
    sims = mn @ mn.T
    out = {}
    n = len(ids)
    for a in range(n):
        for b in range(a + 1, n):
            key = (int(min(ids[a], ids[b])), int(max(ids[a], ids[b])))
            out[key] = float(sims[a, b])
    return out


def check_brute_topk(rng, ctx):
    t, ids, mn, _ = _emb_table(rng, with_dups=False)
    nq = int(rng.integers(1, 5))
    k = int(rng.integers(1, 9))
    q = rng.normal(size=(nq, mn.shape[1])).astype(np.float32)
    got = brute_topk(ray.data.from_arrow(t), q, k=k)
    qn = _normalize(q.astype(np.float64))
    sims = np.round(mn @ qn.T, 6)             # (n, nq), engine's grain
    by_id = {int(i): r for r, i in enumerate(ids)}
    for qi in range(nq):
        g = got[got.query_idx == qi]
        order = np.lexsort((ids, -sims[:, qi]))
        exp_k = min(k, len(ids))
        assert len(g) == exp_k, f"{ctx} topk q{qi}: {len(g)} != {exp_k}"
        kth = sims[order[exp_k - 1], qi]
        exp_ids = set(int(ids[r]) for r in order[:exp_k])
        for vid, cos in zip(g.vec_id.to_numpy(), g.cosine.to_numpy()):
            bc = sims[by_id[int(vid)], qi]
            assert abs(cos - bc) <= 1e-9, \
                f"{ctx} topk q{qi} id={vid}: cosine {cos} != {bc}"
            # membership may differ from the oracle only at the kth
            # boundary (2 rounding ulps), never above it
            assert int(vid) in exp_ids or abs(bc - kth) <= 2e-6, \
                f"{ctx} topk q{qi}: id={vid} cos={bc} not in top-{k} " \
                f"(kth={kth})"
        got_min = g.cosine.to_numpy().min()
        assert got_min >= kth - 2e-6, \
            f"{ctx} topk q{qi}: min returned {got_min} < kth {kth}"


def _cmp_pairs(got: pd.DataFrame, allsims: dict, threshold: float,
               ctx: str, require_all: bool = True):
    """got pairs vs the exact all-pairs cosine map.  Membership may
    disagree with the oracle only for pairs whose exact cosine is
    within 1e-9 of the threshold (matmul association order differs
    between the blocked engine and the whole-matrix oracle)."""
    got_keys = {(int(a), int(b)): float(c) for a, b, c in
                zip(got["a"], got["b"], got["cosine"])}
    for key, cos in got_keys.items():
        exact = allsims[key]
        assert exact >= threshold - 1e-9, \
            f"{ctx}: spurious pair {key} cos={cos} exact={exact}"
        assert abs(cos - round(exact, 6)) <= 1e-9 + 5e-7, \
            f"{ctx}: pair {key} cosine {cos} != {exact}"
    if require_all:
        for key, exact in allsims.items():
            if exact >= threshold:
                assert key in got_keys or exact - threshold <= 1e-9, \
                    f"{ctx}: missing pair {key} cos={exact}"


def check_exact_pairs(rng, ctx):
    t, ids, mn, _ = _emb_table(rng, with_dups=bool(rng.integers(0, 2)))
    thr = float(rng.uniform(0.2, 0.95))
    block = int(rng.choice([5, 7, 4096]))     # force multi-block paths
    got = embedding_near_dup_pairs(ray.data.from_arrow(t), threshold=thr,
                                   block_rows=block)
    brute = _all_sims(ids, mn)
    _cmp_pairs(got, brute, thr, f"{ctx} exact thr={thr:.3f} block={block}")


def check_bucketed_pairs(rng, ctx):
    t, ids, mn, planted = _emb_table(rng, with_dups=True)
    thr = 0.98
    got = bucketed_near_dup_pairs(
        ray.data.from_arrow(t), threshold=thr,
        n_clusters=int(rng.choice([2, 4, 16])),
        n_probe=int(rng.choice([2, 3])),
        target_bucket=int(rng.choice([8, 1024])))
    brute = _all_sims(ids, mn)
    # precision is exact (in-bucket verify); recall is guaranteed only
    # for identical vectors (identical bucket sets) — check both
    _cmp_pairs(got, brute, thr, f"{ctx} bucketed", require_all=False)
    got_keys = set(zip(got["a"].astype(int), got["b"].astype(int)))
    for key in planted:
        assert key in got_keys, \
            f"{ctx} bucketed: planted exact dup {key} missed"


# ------------------------------------------------------------------ text

_WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta",
          "theta", "iota", "kappa"]


def _docs_table(rng):
    """Random doc corpus with duplicate texts, shared prefixes and
    sub-shingle-width shorties."""
    n = int(rng.integers(3, 50))
    texts = []
    pool = [" ".join(rng.choice(_WORDS, size=int(rng.integers(0, 10))))
            for _ in range(max(2, n // 3))]
    for _ in range(n):
        r = rng.random()
        if r < 0.45:
            texts.append(str(rng.choice(pool)))          # exact dup family
        elif r < 0.7 and pool:
            base = str(rng.choice(pool)).split()
            if base and rng.random() < 0.5:
                base[int(rng.integers(0, len(base)))] = \
                    str(rng.choice(_WORDS))              # near dup
            texts.append(" ".join(base))
        else:
            texts.append(" ".join(
                rng.choice(_WORDS, size=int(rng.integers(0, 8)))))
    ids = rng.permutation(np.arange(1, n + 1)).astype(np.int64)
    return pd.DataFrame({"doc_id": ids, "text": texts})


def _shingles(text: str, w: int) -> set:
    toks = [t for t in text.split(" ") if t]
    return {tuple(toks[i:i + w]) for i in range(len(toks) - w + 1)}


def _brute_jaccard(docs: pd.DataFrame, a: int, b: int, w: int) -> float:
    ta = docs.loc[docs.doc_id == a, "text"].iloc[0]
    tb = docs.loc[docs.doc_id == b, "text"].iloc[0]
    sa, sb = _shingles(ta, w), _shingles(tb, w)
    if not sa or not sb:
        return -1.0                           # engine filters empty sets
    return len(sa & sb) / len(sa | sb)


def check_jaccard_verify(rng, docs, ctx):
    w = int(rng.choice([2, 3]))
    thr = float(rng.choice([0.2, 0.5, 0.8]))
    ids = docs["doc_id"].to_numpy()
    npairs = int(rng.integers(1, 30))
    a = rng.choice(ids, size=npairs)
    b = rng.choice(ids, size=npairs)
    keep = a != b
    pairs = pd.DataFrame({"a": np.minimum(a, b)[keep].astype(np.int64),
                          "b": np.maximum(a, b)[keep].astype(np.int64)})
    pairs = pairs.drop_duplicates().reset_index(drop=True)
    got = jaccard_verify(ray.data.from_pandas(docs),
                         ray.data.from_pandas(pairs) if len(pairs)
                         else None, thr, w=w)
    exp = {}
    for r in pairs.itertuples():
        j = _brute_jaccard(docs, int(r.a), int(r.b), w)
        if j >= thr:
            exp[(int(r.a), int(r.b))] = round(j, 6)
    got_map = {(int(a_), int(b_)): float(j_) for a_, b_, j_ in
               zip(got["a"], got["b"], got["jaccard"])}
    assert got_map.keys() == exp.keys(), \
        f"{ctx} verify w={w} thr={thr}: {sorted(got_map)} != {sorted(exp)}"
    for k_, v in exp.items():
        assert abs(got_map[k_] - v) <= 1e-9, \
            f"{ctx} verify {k_}: {got_map[k_]} != {v}"


def check_lsh_near_dups(rng, docs, ctx):
    w = 3
    thr = float(rng.choice([0.4, 0.7]))
    got = near_dup_pairs(ray.data.from_pandas(docs), threshold=thr,
                         k=32, bands=8, w=w)
    got_map = {(int(a_), int(b_)): float(j_) for a_, b_, j_ in
               zip(got["a"], got["b"], got["jaccard"])}
    # precision is exact: every returned pair's true jaccard >= thr
    for (a, b), j in got_map.items():
        bj = _brute_jaccard(docs, a, b, w)
        assert bj >= thr and abs(j - round(bj, 6)) <= 1e-9, \
            f"{ctx} lsh thr={thr}: pair ({a},{b}) j={j} brute={bj}"
    # guaranteed recall: identical texts with >= w tokens collide in
    # every band -> their pair is always a candidate and j == 1.0
    texts = docs.set_index("doc_id")["text"]
    by_text = {}
    for did, txt in texts.items():
        if len([t for t in txt.split(" ") if t]) >= w:
            by_text.setdefault(txt, []).append(int(did))
    for txt, group in by_text.items():
        if len(group) < 2 or len(group) > 8:
            continue
        g = sorted(group)
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                assert (g[i], g[j]) in got_map, \
                    f"{ctx} lsh: identical-text pair ({g[i]},{g[j]}) missed"


def run_seed(seed):
    rng = np.random.default_rng(seed)
    ctx = f"seed={seed}"
    check_brute_topk(rng, ctx)
    check_exact_pairs(rng, ctx)
    check_bucketed_pairs(rng, ctx)
    docs = _docs_table(rng)
    check_jaccard_verify(rng, docs, ctx)
    check_lsh_near_dups(rng, docs, ctx)


def main():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    fails = 0
    t0 = time.time()
    done = 0
    for seed in range(START, START + N_SEEDS):
        done += 1
        try:
            run_seed(seed)
        except Exception:
            fails += 1
            print(f"FAIL seed={seed}", flush=True)
            traceback.print_exc()
            if fails >= 3:
                break
        if done % 5 == 0:
            print(f"{done}/{N_SEEDS} seeds, {time.time()-t0:.0f}s, "
                  f"fails={fails}", flush=True)
    print(f"SIMTEXT_FUZZ_DONE fails={fails} seeds={done} "
          f"elapsed={time.time()-t0:.0f}s", flush=True)
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
