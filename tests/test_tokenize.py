"""U1 hook: pluggable tokenizers; arrow and python forms must byte-match,
and a non-default tokenizer must work through build + query."""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from probly_search_ray.functions.tokenize import TOKENIZERS


def _arrow_tokens(tok, s):
    lst = tok.arrow_fn(pa.array([s], type=pa.string()))
    return [t for t in lst[0].as_py()]


@pytest.mark.parametrize("name", ["whitespace", "word"])
@given(s=st.text(alphabet=st.characters(codec="utf-8"), max_size=60))
@settings(max_examples=150, deadline=None)
def test_arrow_py_parity(name, s):
    tok = TOKENIZERS[name]
    # contract: after dropping empties, both forms agree byte-for-byte
    py = [t for t in tok.py_fn(s) if t != ""]
    ar = [t for t in _arrow_tokens(tok, s) if t != ""]
    assert py == ar, (name, s)


@pytest.mark.usefixtures("ray_session")
def test_word_tokenizer_through_engine(tmp_path):
    from probly_search_ray.refmodel import BM25, RefIndex
    from probly_search_ray.functions.tokenize import WORD
    from tests.fixtures import assert_results
    from tests.test_engine import build_engine

    corpus = {0: ("Hello, World! HELLO?",), 1: ("world-wide words",),
              2: ("no match here",)}
    eng = build_engine(tmp_path, corpus, tokenizer="word")
    ref = RefIndex(1)
    for d in sorted(corpus):
        ref.add_document(list(corpus[d]), WORD.py_fn, d)
    for q in ["hello", "world", "wo", "Words"]:
        exp = ref.query(q, BM25(), WORD.py_fn, [1.0])
        got = eng.query(q, "bm25")
        assert_results(got, exp, f"word:{q!r}")
