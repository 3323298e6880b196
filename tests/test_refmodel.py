"""Golden-fixture tests of the pure-Python reference model (FIXTURES.md)."""

import math

import pytest

from probly_search_ray.refmodel import (
    BM25, RefIndex, ZeroToOne, whitespace_tokenizer as tok)
from tests.fixtures import (
    BM25_FIXTURES, DF1_DOC, DF1_QUERY, DOCS2, DOCS2B, INT_BM25_AFTER_REMOVE0_VACUUM,
    INT_BM25_BEFORE, INT_Z2O_AFTER_REMOVE0_NO_VACUUM, INT_Z2O_BEFORE,
    QUERY_FIXTURES, Z2O_FIXTURES, Z2O_MULTIFIELD, assert_results)


def build(corpus):
    """corpus: list of per-doc field tuples, ids 0..n-1; or dict id->tuple."""
    items = corpus.items() if isinstance(corpus, dict) else enumerate(corpus)
    items = list(items)
    nfields = len(items[0][1])
    idx = RefIndex(nfields)
    for key, fields in items:
        idx.add_document(list(fields), tok, key)
    return idx


@pytest.mark.parametrize("fid,corpus,query,expected", BM25_FIXTURES)
def test_bm25_fixtures(fid, corpus, query, expected):
    idx = build(corpus)
    res = idx.query(query, BM25(), tok, [1.0])
    assert_results(res, expected, fid)


@pytest.mark.parametrize("fid,query,expected", QUERY_FIXTURES)
def test_query_fixtures(fid, query, expected):
    idx = build(DOCS2)
    res = idx.query(query, BM25(), tok, [1.0, 1.0])
    assert_results(res, expected, fid)


@pytest.mark.parametrize("fid,corpus,query,expected", Z2O_FIXTURES)
def test_zero_to_one_fixtures(fid, corpus, query, expected):
    idx = build(corpus)
    res = idx.query(query, ZeroToOne(), tok, [1.0])
    assert_results(res, expected, fid)


@pytest.mark.parametrize("fid,corpus,query,expected", Z2O_MULTIFIELD)
def test_zero_to_one_multifield(fid, corpus, query, expected):
    idx = build(corpus)
    res = idx.query(query, ZeroToOne(), tok, [1.0, 1.0])
    assert_results(res, expected, fid)


def test_int_bm25_lifecycle():
    idx = build(DOCS2B)
    res = idx.query("abc", BM25(), tok, [1.0, 1.0])
    assert_results(res, INT_BM25_BEFORE, "INT-1a")
    idx.remove_document(0)
    idx.vacuum()
    res = idx.query("abc", BM25(), tok, [1.0, 1.0])
    assert_results(res, INT_BM25_AFTER_REMOVE0_VACUUM, "INT-1b")


def test_int_zero_to_one_lifecycle():
    idx = build(DOCS2B)
    res = idx.query("abc", ZeroToOne(), tok, [1.0, 1.0])
    assert_results(res, INT_Z2O_BEFORE, "INT-2a")
    idx.remove_document(0)  # tombstone only, no vacuum
    res = idx.query("abc", ZeroToOne(), tok, [1.0, 1.0])
    assert_results(res, INT_Z2O_AFTER_REMOVE0_NO_VACUUM, "INT-2b")


def test_df_exceeds_doc_count():
    # DF-1: occurrence-counted df; must not crash, BM25 clamps min(N, df)
    idx = build([(DF1_DOC,)])
    node = idx._find_node("the,")
    assert idx.count_documents(node) == 3  # 3 occurrences in 1 doc
    res = idx.query(DF1_QUERY, BM25(), tok, [1.0])
    assert len(res) == 1


def test_expansion_order():
    # E-1: reverse-insertion trie order
    idx = build({1: ("abc", "hello world"), 2: ("adef", "lorem ipsum")})
    assert idx.expand_term("a") == ["adef", "abc"]
    # E-2
    idx2 = build({1: ("abc def", "hello world"), 2: ("adef abc", "lorem ipsum")})
    assert idx2.expand_term("x") == []


def test_index_stats():
    # X-1
    idx = build([("a b c",)])
    assert idx.docs[0] == [3]
    assert idx.fields[0].sum == 3 and idx.fields[0].avg == 3.0
    # X-2
    idx = build([("a b c",), ("b c d",)])
    assert idx.fields[0].sum == 6 and idx.fields[0].avg == 3.0
    # X-3: double space -> empty token dropped
    idx = build([("a  b",)])
    assert idx.docs[0] == [2]
    # X-4: remove + vacuum -> empty
    idx = build([("a",)])
    idx.remove_document(0)
    idx.vacuum()
    assert idx.fields[0].sum == 0
    assert math.isnan(idx.fields[0].avg)
    assert idx.query("a", BM25(), tok, [1.0]) == []
