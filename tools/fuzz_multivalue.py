"""Randomized multi-value FieldAccessor fuzz: list<string> field
columns with 0-4 values per doc (the reference's multi-value quirk:
tf / corpus sums accumulate over ALL values, the stored per-doc
field_length is the LAST value's kept-token count) — differential vs
the reference model for queries, stats, removals and vacuum.

Run from the repo root:  FUZZ_SEEDS=150 python tools/fuzz_multivalue.py
(owns its Ray session, like bench.py)."""
import os
import sys
import time
import traceback

import numpy as np
import ray

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from fuzz_diff import assert_results, rand_vocab  # noqa: E402
from probly_search_ray.build import build_index  # noqa: E402
from probly_search_ray.maintain import remove_document, vacuum  # noqa: E402
from probly_search_ray.refmodel import (  # noqa: E402
    BM25, RefIndex, ZeroToOne, whitespace_tokenizer as tok)
from probly_search_ray.search import SearchEngine  # noqa: E402
from tests.test_engine import write_multivalue_corpus  # noqa: E402

N_SEEDS = int(os.environ.get("FUZZ_SEEDS", "150"))
START = int(os.environ.get("FUZZ_START", "40000"))
TOL = 1e-8


def _rand_vals(rng, vocab, nvals_max=4, max_len=6):
    vals = []
    for _ in range(int(rng.integers(0, nvals_max + 1))):
        k = int(rng.integers(0, max_len))
        vals.append(" ".join(rng.choice(vocab, size=k)) if k else "")
    return vals


def _check_stats(eng, ref, nfields, ctx):
    assert eng.stats.num_docs == len(ref.docs), ctx
    for f in range(nfields):
        assert eng.stats.field_sum(f) == ref.fields[f].sum, (ctx, f)
        assert abs(eng.stats.field_avg(f) - ref.fields[f].avg) <= TOL, \
            (ctx, f)


def _check_queries(eng, ref, rng, vocab, nfields, ctx):
    boosts = [float(rng.choice([0.5, 1.0, 2.0])) for _ in range(nfields)]
    qs = [str(rng.choice(vocab)) for _ in range(3)]
    qs += [" ".join(str(t) for t in rng.choice(vocab, size=3)),
           str(rng.choice(vocab))[:1]]
    for q in qs:
        assert_results(eng.query(q, "bm25", fields_boost=boosts),
                       ref.query(q, BM25(), tok, boosts),
                       f"mv-bm25 {ctx} q={q!r}")
        assert_results(eng.query(q, "zero_to_one", fields_boost=boosts),
                       ref.query(q, ZeroToOne(), tok, boosts),
                       f"mv-z2o {ctx} q={q!r}")


def run_seed(seed, td):
    rng = np.random.default_rng(seed)
    nfields = int(rng.integers(1, 3))
    vocab = rand_vocab(rng)
    n_docs = int(rng.integers(8, 60))
    corpus = {}
    for d in range(n_docs):
        corpus[d] = tuple(_rand_vals(rng, vocab) for _ in range(nfields))
    path = write_multivalue_corpus(td, corpus)
    idx = os.path.join(td, "index")
    build_index(path, idx, key_col="doc_id",
                field_cols=[f"f{f}" for f in range(nfields)],
                batch_size=int(rng.choice([5, 4096])),
                block_postings=int(rng.choice([3, 4096])),
                overwrite=True)
    eng = SearchEngine(idx)
    ref = RefIndex(nfields)
    for d in sorted(corpus):
        ref.add_document(list(corpus[d]), tok, d)
    ctx = f"seed={seed}"
    _check_stats(eng, ref, nfields, ctx)
    _check_queries(eng, ref, rng, vocab, nfields, ctx)

    # removals subtract the stored LAST-value field_length
    victims = rng.choice(n_docs, size=min(n_docs - 1,
                                          int(rng.integers(1, 4))),
                         replace=False)
    for v in victims:
        remove_document(idx, int(v))
        ref.remove_document(int(v))
    eng = SearchEngine(idx)
    _check_stats(eng, ref, nfields, ctx + " post-rm")
    _check_queries(eng, ref, rng, vocab, nfields, ctx + " post-rm")

    if seed % 3 == 0:
        vacuum(idx)
        ref.vacuum()
        eng = SearchEngine(idx)
        _check_queries(eng, ref, rng, vocab, nfields, ctx + " post-vac")


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
    print(f"MV_FUZZ_DONE fails={fails} seeds={done} "
          f"elapsed={time.time()-t0:.0f}s", flush=True)
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    os.makedirs("/tmp/fuzzwork", exist_ok=True)
    main()
