"""String (url) document keys: keymap sidecar, hash-ordered insertion
differential vs refmodel, result mapping, removal by key."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from probly_search_ray.build import build_index
from probly_search_ray.maintain import remove_documents_by_key
from probly_search_ray.refmodel import (
    BM25, RefIndex, whitespace_tokenizer as tok)
from probly_search_ray.search import SearchEngine
from probly_search_ray.state.keymap import (
    check_collisions, hash_keys, urls_for)
from tests.fixtures import assert_results


def _url_corpus(seed=17, n=50):
    rng = np.random.default_rng(seed)
    vocab = np.array(["a", "ab", "b", "ba", "crawl", "cra", "web", "we"])
    return {f"https://site{d}.example/page/{d}":
            " ".join(rng.choice(vocab, size=int(rng.integers(1, 10))))
            for d in range(n)}


@pytest.mark.usefixtures("ray_session")
def test_string_keys_end_to_end(tmp_path):
    corpus = _url_corpus()
    urls = list(corpus)
    pq.write_table(pa.table({
        "url": pa.array(urls, type=pa.string()),
        "text": pa.array([corpus[u] for u in urls], type=pa.string()),
    }), str(tmp_path / "docs.parquet"))
    idx = str(tmp_path / "index")
    build_index(str(tmp_path / "docs.parquet"), idx, key_col="url",
                field_cols=["text"], string_key=True, batch_size=7,
                overwrite=True)

    # keymap sidecar: complete and collision-free
    ids = hash_keys(urls)
    assert len(check_collisions(idx, "url")) == 0
    m = urls_for(idx, ids.tolist(), "url")
    assert set(m.values()) == set(urls)

    # engine insertion order == ascending hash order → refmodel parity
    ref = RefIndex(1)
    order = np.argsort(ids)
    for i in order:
        ref.add_document([corpus[urls[i]]], tok, int(ids[i]))
    eng = SearchEngine(idx)
    for q in ["a", "cra", "web a", "crawl b"]:
        assert_results(eng.query(q, "bm25"),
                       ref.query(q, BM25(), tok, [1.0]), f"sk:{q!r}")

    # result → url mapping
    res = eng.query("crawl", "bm25", k=5)
    mapped = eng.keys_for(res)
    assert all(u.startswith("https://site") for u, _ in mapped)
    assert [s for _, s in mapped] == [s for _, s in res]

    # removal by key updates results + stats like the reference
    victim_url = mapped[0][0]
    assert remove_documents_by_key(idx, [victim_url]) == 1
    ref.remove_document(int(hash_keys([victim_url])[0]))
    eng2 = SearchEngine(idx)
    assert_results(eng2.query("crawl", "bm25"),
                   ref.query("crawl", BM25(), tok, [1.0]), "sk:removed")


@pytest.mark.usefixtures("ray_session")
def test_composition_torture(tmp_path):
    """String keys × multi-value fields × remove × vacuum × compaction,
    differential vs refmodel at every step."""
    from probly_search_ray.maintain import compact_groups, vacuum
    rng = np.random.default_rng(53)
    vocab = np.array(["a", "ab", "b", "ba", "crawl", "cra", "web"])
    urls, rows_f0, rows_f1 = [], [], []
    for d in range(40):
        urls.append(f"https://x{d}.example/")
        nvals = int(rng.integers(0, 3))
        rows_f0.append([" ".join(rng.choice(vocab, int(rng.integers(0, 5))))
                        for _ in range(nvals)])
        rows_f1.append([" ".join(rng.choice(vocab, int(rng.integers(1, 6))))])
    f1 = str(tmp_path / "a.parquet")
    f2 = str(tmp_path / "b.parquet")
    for path, sl in ((f1, slice(0, 25)), (f2, slice(25, 40))):
        pq.write_table(pa.table({
            "url": pa.array(urls[sl], type=pa.string()),
            "t0": pa.array(rows_f0[sl], type=pa.list_(pa.string())),
            "t1": pa.array(rows_f1[sl], type=pa.list_(pa.string())),
        }), path)
    idx = str(tmp_path / "index")
    build_index([f1, f2], idx, key_col="url", field_cols=["t0", "t1"],
                string_key=True, files_per_group=1, batch_size=7)

    ids = hash_keys(urls)
    ref = RefIndex(2)
    for i in np.argsort(ids):  # engine insertion order = hash order
        ref.add_document([rows_f0[i], rows_f1[i]], tok, int(ids[i]))

    def check(eng, tag):
        for q in ["a", "cra", "web b", "ab ba crawl"]:
            for boosts in ([1.0, 1.0], [2.0, 0.5]):
                assert_results(
                    eng.query(q, "bm25", fields_boost=list(boosts)),
                    ref.query(q, BM25(), tok, boosts), f"{tag}:{q!r}")

    check(SearchEngine(idx), "built")
    assert remove_documents_by_key(idx, [urls[3], urls[30]]) == 2
    ref.remove_document(int(ids[3]))
    ref.remove_document(int(ids[30]))
    check(SearchEngine(idx), "removed")
    vacuum(idx)
    ref.vacuum()
    check(SearchEngine(idx), "vacuumed")
    assert compact_groups(idx) == 2
    check(SearchEngine(idx), "compacted")
