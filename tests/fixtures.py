"""Golden fixtures transcribed from the reference tests (see FIXTURES.md).

Each fixture: (corpus, query, scorer, expected [(doc_id, score), ...]) with
canonical order (score desc, doc_id asc) and 1e-8 score tolerance.

``corpus`` is a list of per-doc field-text tuples; doc ids are 0..n-1 in
list order unless explicitly given as dicts.
"""

TOL = 1e-8

# --- BM25, one field (docs1) ------------------------------------------------
BM25_FIXTURES = [
    # id, corpus(list of 1-field tuples), query, expected
    ("BM25-1", [("a b c",), ("c d e",)], "a", [(0, 0.6931471805599453)]),
    ("BM25-2", [("a b c",), ("c d e",)], "c",
     [(0, 0.1823215567939546), (1, 0.1823215567939546)]),
]

# --- BM25, two fields (docs2: title, text), doc ids 1 and 2 -----------------
DOCS2 = {1: ("a b c", "hello world"), 2: ("c d e", "lorem ipsum")}
QUERY_FIXTURES = [
    ("Q-1", "a", [(1, 0.6931471805599453)]),
    ("Q-2", "c", [(1, 0.1823215567939546), (2, 0.1823215567939546)]),
    ("Q-3", "h", [(1, 0.12637567304702957)]),
    ("Q-4", "a d", [(1, 0.6931471805599453), (2, 0.6931471805599453)]),
]

# --- Integration: docs2b (title, description), ids 0 and 1 ------------------
DOCS2B = {0: ("abc", "dfg"), 1: ("dfgh", "abcd")}
INT_BM25_BEFORE = [(0, 0.6931471805599453), (1, 0.28104699650060755)]
INT_BM25_AFTER_REMOVE0_VACUUM = [(1, 0.1166450426074421)]
INT_Z2O_BEFORE = [(0, 1.0), (1, 0.75)]
INT_Z2O_AFTER_REMOVE0_NO_VACUUM = [(1, 0.75)]

# --- df regression (DF-1) ---------------------------------------------------
DF1_DOC = "this is text with lots of the, the, the, the"
DF1_QUERY = "What did the author do growing up?"

# --- zero_to_one, one field -------------------------------------------------
Z2O_FIXTURES = [
    ("Z-1", [("abc",), ("abcefg",), ("abcefghij",)], "abc",
     [(0, 1.0), (1, 0.5), (2, 0.33333333333333337)]),
    ("Z-2", [("abcdef abcdefghi",)], "abc abc", [(0, 0.4166666666666667)]),
    ("Z-3", [("abc",)], "abc abc", [(0, 0.5)]),
    ("Z-4", [("abc abc",)], "abc", [(0, 0.5)]),
    ("Z-5", [("abc abc",)], "abc ab", [(0, 0.8333333333333334)]),
    ("Z-6", [("abc ab",)], "abc abc", [(0, 0.5)]),
    ("Z-7", [("oy oy oysters",)], "oy oy oysters", [(0, 1.0)]),
    ("Z-8", [("abcdef",), ("abc abcdef",), ("abcdef abcdef",),
             ("abcdef abcdefghi",), ("def abcdef",)], "abc",
     [(0, 0.5), (1, 0.5), (2, 0.25), (3, 0.25), (4, 0.25)]),
    ("Z-9", [("abcdef",), ("abc abcdef",), ("abcdef abcdef",),
             ("abcdef abcdefghi",), ("def abcdef",)], "abc abc",
     [(1, 0.75), (2, 0.5), (3, 0.4166666666666667), (0, 0.25), (4, 0.25)]),
]

# Z-10 / Z-11: two fields
Z2O_MULTIFIELD = [
    ("Z-10", [("abc", "abc"), ("abcefg", "abcefg"), ("abcefghij", "abcefghij")],
     "abc", [(0, 1.0), (1, 0.5), (2, 0.33333333333333337)]),
    ("Z-11", [("abc", "a"), ("abcefg", "a"), ("abcefghij", "a")],
     "abc", [(0, 1.0), (1, 0.5), (2, 0.33333333333333337)]),
]

# --- expansion fixtures -----------------------------------------------------
# E-1: titles ["abc", "adef"] (2-field index, second field from DOCS2 texts)
# expand "a" -> ["adef", "abc"] (reverse-insertion trie order)
# E-2: titles ["abc def", "adef abc"], expand "x" -> []

# --- index structure --------------------------------------------------------
# X-1: 1 doc "a b c" -> field_length [3], sum=3 avg=3.0
# X-2: docs "a b c" + "b c d" -> sum=6 avg=3.0
# X-3: "a  b" -> empty token dropped
# X-4: "a"; remove + vacuum -> empty index, sum=0


def assert_results(actual, expected, fid=""):
    assert len(actual) == len(expected), (
        f"{fid}: got {len(actual)} results {actual}, want {len(expected)} {expected}")
    for (ak, asc), (ek, esc) in zip(actual, expected):
        assert ak == ek, f"{fid}: key {ak} != {ek}; actual={actual} expected={expected}"
        assert abs(asc - esc) < TOL, f"{fid}: score {asc} != {esc}"
