"""Dedup pipelines with PLANTED duplicates (the oracle comparisons on
random testdata are near-vacuous — these pin real recall)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from probly_search_ray.stages.dedup import dedup_exact, near_dup_pairs


def _corpus_with_dups(seed=4):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i}" for i in range(500)])
    docs = {}
    for d in range(60):
        docs[d] = " ".join(rng.choice(vocab, size=40))
    # exact dups: 100=copy of 0, 101=copy of 1
    docs[100] = docs[0]
    docs[101] = docs[1]
    # near dups: 200 = doc 2 with 3 tokens changed; 201 = doc 3 + suffix
    t = docs[2].split(" ")
    t[5], t[17], t[33] = "xx1", "xx2", "xx3"
    docs[200] = " ".join(t)
    docs[201] = docs[3] + " tail1 tail2"
    return docs


@pytest.fixture()
def docs_ds(ray_session):
    docs = _corpus_with_dups()
    df = pd.DataFrame({"doc_id": list(docs), "text": list(docs.values())})
    return rd.from_pandas(df), docs


def test_dedup_exact_planted(docs_ds):
    ds, docs = docs_ds
    survivors = set(dedup_exact(ds).to_pandas()["doc_id"])
    assert 0 in survivors and 100 not in survivors
    assert 1 in survivors and 101 not in survivors
    assert len(survivors) == len(docs) - 2


def test_near_dup_pairs_planted(docs_ds):
    ds, docs = docs_ds
    # 3 changed tokens kill ~3 shingles each → jaccard ≈ 0.6 for (2,200);
    # bands=32 (r=4) gives ≥99% collision probability at that level
    pairs = near_dup_pairs(ds, threshold=0.5, bands=32)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 100) in got     # exact dup → jaccard 1.0
    assert (1, 101) in got
    assert (2, 200) in got     # 3/40 tokens changed
    assert (3, 201) in got     # suffix added
    # no false positives among unrelated random docs
    for a, b in got:
        assert (a, b) in {(0, 100), (1, 101), (2, 200), (3, 201)}, (a, b)
    # jaccard values sane
    j = dict(((a, b), v) for a, b, v in
             zip(pairs["a"], pairs["b"], pairs["jaccard"]))
    assert j[(0, 100)] == 1.0
    assert 0.5 <= j[(2, 200)] < 1.0


def test_jaccard_verify_chunked(docs_ds):
    """pair_chunk smaller than the pair count must verify identically —
    chunking only bounds the membership broadcast, never the result."""
    from probly_search_ray.stages.dedup import (jaccard_verify,
                                                lsh_candidate_pairs)
    ds, _ = docs_ds
    cands = lsh_candidate_pairs(ds, bands=32).materialize()
    full = jaccard_verify(ds, cands, 0.5)
    chunked = jaccard_verify(ds, cands, 0.5, pair_chunk=2)
    pd.testing.assert_frame_equal(full, chunked)
    assert len(full) >= 4


def test_near_dup_pairs_many_candidates(ray_session):
    """Distributed verify at scale: >=10^4 planted candidate pairs flow
    through the broadcast-membership + count-aggregate verify (no
    driver shingle dict); recall must be exact."""
    rng = np.random.default_rng(11)
    n_base = 10_500
    vocab = np.array([f"tok{i}" for i in range(5000)])
    base = [" ".join(rng.choice(vocab, size=30)) for _ in range(n_base)]
    ids, texts = [], []
    for i, t in enumerate(base):
        ids.append(i)
        texts.append(t)
        # near-dup: one token changed out of 30 → jaccard ≈ 25/31 ≈ 0.8
        toks = t.split(" ")
        toks[7] = "zz" + str(i)
        ids.append(100_000 + i)
        texts.append(" ".join(toks))
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": ids, "text": texts})).repartition(16)
    pairs = near_dup_pairs(ds, threshold=0.6, bands=64)
    got = set(zip(pairs["a"], pairs["b"]))
    planted = {(i, 100_000 + i) for i in range(n_base)}
    missing = planted - got
    assert not missing, f"{len(missing)} planted pairs missed"
    assert len(got) >= 10_000
    extras = got - planted
    # unrelated 30-token docs over a 5k vocab can't reach jaccard 0.6
    assert not extras, list(extras)[:5]
    assert (pairs["jaccard"] >= 0.6).all()


def test_connected_components(ray_session):
    """Hash-min label propagation: chain, pair, star, and a 41-node
    chain (pointer jumping must converge in O(log) rounds, well under
    the iteration cap)."""
    import ray.data
    from probly_search_ray.stages.dedup import connected_components
    pairs = pd.DataFrame({"a": [1, 2, 3, 4, 10, 21, 22, 23],
                          "b": [2, 3, 4, 5, 11, 20, 20, 20]})
    cc = connected_components(pairs).to_pandas().sort_values("node")
    assert cc["node"].tolist() == [1, 2, 3, 4, 5, 10, 11, 20, 21, 22, 23]
    assert cc["comp"].tolist() == [1, 1, 1, 1, 1, 10, 10, 20, 20, 20, 20]
    n = 41
    chain = pd.DataFrame({"a": list(range(n - 1)), "b": list(range(1, n))})
    cc2 = connected_components(chain).to_pandas()
    assert len(cc2) == n and set(cc2["comp"]) == {0}
    assert len(connected_components(pd.DataFrame({"a": [], "b": []}))
               .to_pandas()) == 0


def test_exact_dup_drops(ray_session):
    import ray.data
    from probly_search_ray.stages.dedup import exact_dup_drops
    docs = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4, 5],
                         "text": ["x", "y", "x", "z", "y", "x"]})
    dr = exact_dup_drops(ray.data.from_pandas(docs)).to_pandas()
    assert sorted(dr["doc_id"]) == [2, 4, 5]


@pytest.mark.usefixtures("ray_session")
def test_dup_span_stats_planted():
    """Join-free dup-span plan == brute-force n-gram counting, with
    planted cross-doc and within-doc repeats, any block layout."""
    from probly_search_ray.stages.dedup import dup_span_stats
    docs = pd.DataFrame({"doc_id": np.arange(6, dtype=np.int64), "text": [
        "a b c d e f g h",          # shares 'a b c d e' with doc 1
        "a b c d e x y z",
        "p q r s t u v w",          # unique
        "m n o m n o m n o m n",    # within-doc repeated 5-grams
        "short one",                # < 5 tokens → excluded
        "p q r s t zz qq ww",       # shares 'p q r s t' with doc 2
    ]})
    # brute force
    want = {}
    grams = {}
    for _, r in docs.iterrows():
        ts = r["text"].split()
        gs = [" ".join(ts[i:i + 5]) for i in range(len(ts) - 4)]
        if gs:
            want[r["doc_id"]] = gs
        for g in gs:
            grams[g] = grams.get(g, 0) + 1
    for nblocks in (1, 3):
        got = dup_span_stats(
            rd.from_pandas(docs).repartition(nblocks), w=5) \
            .to_pandas().sort_values("doc_id").set_index("doc_id")
        assert sorted(got.index) == sorted(want)
        for d, gs in want.items():
            dup = sum(1 for g in gs if grams[g] >= 2)
            assert got.loc[d, "n_spans"] == len(gs), d
            assert got.loc[d, "n_dup_spans"] == dup, (d, nblocks)
