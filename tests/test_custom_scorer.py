"""U3 hook: custom ScoreCalculator instances through the distributed
engine must match the refmodel exactly (including the generic
occurrence-visit path and stateful calculators)."""

import numpy as np
import pytest

from probly_search_ray.refmodel import (
    BM25, RefIndex, ScoreCalculator, ZeroToOne, whitespace_tokenizer as tok)
from tests.fixtures import assert_results
from tests.test_engine import _rand_corpus, build_engine


class CountingScorer(ScoreCalculator):
    """A stateful custom scorer: score = tf-weighted constant + visit
    count influence — exercises before_each/score/finalize and N."""

    def __init__(self):
        self.calls = 0

    def before_each(self, term_data, document_frequency, docs):
        return (document_frequency, len(docs))

    def score(self, before, term_frequency, field_length, node_uid,
              fields_boost, fields, term_data):
        self.calls += 1
        df, n = before
        s = sum(tf * b for tf, b in zip(term_frequency, fields_boost))
        return s / (1.0 + df) + 0.001 * n if s > 0 else None

    def finalize(self, results):
        for r in results:
            r[1] = round(r[1], 9)


@pytest.mark.usefixtures("ray_session")
def test_custom_scorer_differential(tmp_path):
    rng = np.random.default_rng(5)
    vocab = np.array(["a", "ab", "abc", "b", "bc", "ca", "the", "zeb"])
    corpus = _rand_corpus(rng, 30, 2, vocab, max_len=8)
    eng = build_engine(tmp_path, corpus, batch_size=7)

    ref = RefIndex(2)
    for d in sorted(corpus):
        ref.add_document(list(corpus[d]), tok, d)

    for q in ["a", "ab c", "the zeb", "b b"]:
        exp = ref.query(q, CountingScorer(), tok, [1.0, 2.0])
        got = eng.query(q, scorer=CountingScorer(), fields_boost=[1.0, 2.0])
        assert_results(got, exp, f"custom:{q!r}")


@pytest.mark.usefixtures("ray_session")
def test_builtin_scorers_via_custom_path(tmp_path):
    """BM25/ZeroToOne instances through the generic path == the
    vectorized fast paths."""
    rng = np.random.default_rng(6)
    vocab = np.array(["alpha", "alp", "beta", "bet", "g", "gamma"])
    corpus = _rand_corpus(rng, 25, 1, vocab, max_len=6)
    eng = build_engine(tmp_path, corpus)
    for q in ["alp", "b", "g gamma"]:
        fast_b = eng.query(q, "bm25")
        slow_b = eng.query(q, scorer=BM25())
        assert_results(slow_b, fast_b, f"bm25path:{q!r}")
        fast_z = eng.query(q, "zero_to_one")
        slow_z = eng.query(q, scorer=ZeroToOne())
        assert_results(slow_z, fast_z, f"z2opath:{q!r}")
