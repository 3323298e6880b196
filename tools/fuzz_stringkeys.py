"""Randomized string-key fuzz: url-keyed corpora (unicode, shared
prefixes, varied lengths) built with ``string_key=True`` — keymap
completeness, result→key mapping, removal by key and vacuum, all
differentially checked against the reference model keyed by the same
hash ids in ascending-hash insertion order.

Run from the repo root:  FUZZ_SEEDS=200 python tools/fuzz_stringkeys.py
(owns its Ray session, like bench.py)."""
import os
import sys
import time
import traceback

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from fuzz_diff import assert_results, rand_queries, rand_vocab  # noqa: E402
from probly_search_ray.build import build_index  # noqa: E402
from probly_search_ray.maintain import (  # noqa: E402
    remove_documents_by_key, vacuum)
from probly_search_ray.refmodel import (  # noqa: E402
    BM25, RefIndex, ZeroToOne, whitespace_tokenizer as tok)
from probly_search_ray.search import SearchEngine  # noqa: E402
from probly_search_ray.state.keymap import (  # noqa: E402
    check_collisions, hash_keys, urls_for)

N_SEEDS = int(os.environ.get("FUZZ_SEEDS", "200"))
START = int(os.environ.get("FUZZ_START", "60000"))

HOSTS = ["example.com", "データ.jp", "crawl.org", "a.b"]


def _rand_keys(rng, n):
    keys = []
    for d in range(n):
        host = HOSTS[int(rng.integers(0, len(HOSTS)))]
        depth = int(rng.integers(0, 4))
        path = "/".join(f"p{int(rng.integers(0, 9))}" for _ in range(depth))
        keys.append(f"https://{host}/{path}?id={d}")
    return keys


def _check(eng, ref, rng, vocab, ctx):
    for q in rand_queries(rng, vocab, n=6):
        exp = ref.query(q, BM25(), tok, [1.0])
        assert_results(eng.query(q, "bm25"), exp, f"sk-bm25 {ctx} q={q!r}")
        kk = int(rng.integers(1, 6))
        assert_results(eng.query(q, "bm25", k=kk), exp,
                       f"sk-k{kk} {ctx} q={q!r}", k=kk)
        assert_results(eng.query(q, "zero_to_one"),
                       ref.query(q, ZeroToOne(), tok, [1.0]),
                       f"sk-z2o {ctx} q={q!r}")


def run_seed(seed, td):
    rng = np.random.default_rng(seed)
    vocab = rand_vocab(rng)
    n = int(rng.integers(8, 80))
    keys = _rand_keys(rng, n)
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(0, 10))))
             for _ in range(n)]
    pq.write_table(pa.table({
        "url": pa.array(keys, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
    }), os.path.join(td, "docs.parquet"))
    idx = os.path.join(td, "index")
    build_index(os.path.join(td, "docs.parquet"), idx, key_col="url",
                field_cols=["text"], string_key=True,
                batch_size=int(rng.choice([5, 4096])), overwrite=True)

    ids = hash_keys(keys)
    assert len(check_collisions(idx, "url")) == 0, f"seed={seed}"
    mapped = urls_for(idx, ids.tolist(), "url")
    assert set(mapped.values()) == set(keys), f"seed={seed} keymap"

    ref = RefIndex(1)
    by_id = {}
    for i in np.argsort(ids):  # ascending-hash insertion order
        ref.add_document([texts[i]], tok, int(ids[i]))
        by_id[int(ids[i])] = keys[i]
    eng = SearchEngine(idx)
    _check(eng, ref, rng, vocab, f"seed={seed}")

    # result → key mapping round-trips (same scores, ids → urls)
    res = eng.query(str(rng.choice(vocab)), "bm25", k=5)
    for (url, s), (did, s2) in zip(eng.keys_for(res), res):
        assert url == by_id[int(did)] and s == s2, f"seed={seed} keys_for"

    # removal by key (+ optional vacuum), differential after each
    victims = [keys[i] for i in
               rng.choice(n, size=min(n - 1, int(rng.integers(1, 4))),
                          replace=False)]
    assert remove_documents_by_key(idx, victims) == len(victims)
    for v in victims:
        ref.remove_document(int(hash_keys([v])[0]))
    eng = SearchEngine(idx)
    _check(eng, ref, rng, vocab, f"seed={seed} post-rm")
    if seed % 3 == 0:
        vacuum(idx)
        ref.vacuum()
        eng = SearchEngine(idx)
        _check(eng, ref, rng, vocab, f"seed={seed} post-vac")


def main():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import tempfile
    fails = 0
    t0 = time.time()
    done = 0
    for seed in range(START, START + N_SEEDS):
        with tempfile.TemporaryDirectory(dir="/tmp/fuzzwork") as td:
            try:
                run_seed(seed, td)
            except Exception:
                fails += 1
                print(f"FAIL seed={seed}", flush=True)
                traceback.print_exc()
                if fails >= 3:
                    break
        done += 1
        if done % 20 == 0:
            print(f"{done}/{N_SEEDS} seeds, {time.time()-t0:.0f}s, "
                  f"fails={fails}", flush=True)
    print(f"SK_FUZZ_DONE fails={fails} seeds={done} "
          f"elapsed={time.time()-t0:.0f}s", flush=True)
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    os.makedirs("/tmp/fuzzwork", exist_ok=True)
    main()
