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
