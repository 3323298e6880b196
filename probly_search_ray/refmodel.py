"""Pure-Python single-process reference model of probly-search semantics.

This module is the *oracle* for differential testing of the distributed
Ray Data engine.  It is a faithful transcription of the behaviour of the
reference library (quantleaf/probly-search v2.0.1) as documented in
SURVEY.md — NOT a code port; the data structures are plain Python and the
semantics were derived from reading the reference:

- trie inverted index with one posting *per occurrence*, prepended
  (``/root/reference/src/index.rs:77-158``)
- occurrence-counted document frequency, tombstone-aware
  (``src/index.rs:281-297``, ``tests/document_frequency.rs``)
- prefix expansion in trie DFS order with children in reverse insertion
  order (``src/query.rs:108-147``)
- ``max_score_merger``: max within a query term's expansions, sum across
  query terms, with the first-visited-expansion asymmetry
  (``src/query.rs:150-164``)
- BM25 with ``min(N, df)`` clamping and UTF-8 byte-length expansion
  boost (``src/score/default/bm25.rs``)
- zero-to-one scorer with per-(doc, field) record pools
  (``src/score/default/zero_to_one.rs``)
- remove/vacuum with immediate stat updates (``src/index.rs:160-241``)

Scale note: this model is intentionally single-threaded and in-memory;
it exists only to validate the Ray engine on small corpora.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Optional


def whitespace_tokenizer(s: str) -> list[str]:
    """The reference test tokenizer: split on a single space.

    ``/root/reference/src/lib.rs:42-44`` — empty tokens are produced for
    repeated spaces and filtered later (``src/index.rs:100-110``).
    """
    return s.split(" ")


class _Node:
    """Trie node.  ``children`` is kept newest-first, matching the
    reference's prepend-on-create sibling list (``src/index.rs:409-419``).
    ``postings`` is newest-first too (``src/index.rs:422-433``)."""

    __slots__ = ("char", "children", "postings", "uid")

    def __init__(self, char: str, uid: int):
        self.char = char
        self.children: list[_Node] = []  # newest first
        # list of (doc_key, term_frequency list) — newest first
        self.postings: list[tuple] = []
        self.uid = uid


@dataclass
class TermData:
    query_term_index: int
    query_terms_len: int
    query_term: str
    query_term_expanded: str


@dataclass
class FieldDetails:
    sum: int = 0
    avg: float = 0.0


class ScoreCalculator:
    """Mirror of the reference's ``ScoreCalculator`` trait
    (``/root/reference/src/score/calculator.rs:33-70``)."""

    def before_each(self, term_data: TermData, document_frequency: int,
                    docs: dict) -> Optional[object]:
        return None

    def score(self, before, term_frequency: list[int], field_length: list[int],
              node_uid: int, fields_boost: list[float],
              fields: list[FieldDetails], term_data: TermData) -> Optional[float]:
        raise NotImplementedError

    def finalize(self, results: list[list]) -> None:  # [key, score] pairs
        pass


class BM25(ScoreCalculator):
    """``/root/reference/src/score/default/bm25.rs``"""

    def __init__(self, k1: float = 1.2, b: float = 0.75):
        self.k1 = k1
        self.b = b

    def before_each(self, term_data, document_frequency, docs):
        n_docs = len(docs)
        freq = min(n_docs, document_frequency)
        diff = n_docs - freq
        qe = term_data.query_term_expanded
        qt = term_data.query_term
        if qe == qt:
            boost = 1.0
        else:
            # Rust str::len() is the UTF-8 byte length.
            boost = math.log(
                1.0 + 1.0 / (1.0 + len(qe.encode()) - len(qt.encode())))
        idf = math.log(1.0 + (diff + 0.5) / (freq + 0.5))
        return (idf, boost)

    def score(self, before, term_frequency, field_length, node_uid,
              fields_boost, fields, term_data):
        idf, boost = before
        s = 0.0
        for x in range(len(field_length)):
            tf = float(term_frequency[x])
            if tf > 0.0:
                fl = float(field_length[x])
                avg = fields[x].avg
                tf = ((self.k1 + 1.0) * tf) / (
                    self.k1 * ((1.0 - self.b) + self.b * (fl / avg)) + tf)
                s += tf * idf * fields_boost[x] * boost
        return s if s > 0.0 else None


class ZeroToOne(ScoreCalculator):
    """``/root/reference/src/score/default/zero_to_one.rs``"""

    def __init__(self):
        # key -> per-field list of record dicts
        self.score_by_document_and_field: dict = {}

    def score(self, before, term_frequency, field_length, node_uid,
              fields_boost, fields, term_data):
        key = self._current_key
        for x in range(len(field_length)):
            tf = term_frequency[x]
            if tf > 0:
                te = float(len(term_data.query_term_expanded.encode()))
                tl = float(len(term_data.query_term.encode()))
                fl = field_length[x]
                per_field = self.score_by_document_and_field.setdefault(
                    key, [[] for _ in range(len(field_length))])
                per_field[x].append({
                    "score": 1.0 - abs(te - tl) / te,
                    "all_query_terms_len": term_data.query_terms_len,
                    "query_term_index": term_data.query_term_index,
                    "index_node_id": node_uid,
                    "term_frequency": tf,
                    "field_length": fl,
                })
        return 0.0  # dummy; real score computed in finalize

    def finalize(self, results):
        for result in results:
            key = result[0]
            for field_scores in self.score_by_document_and_field[key]:
                df_pool_by_id: dict[int, int] = {}
                consumed_index: set[int] = set()
                # Python's sort is stable, like Rust's sort_by.
                field_scores.sort(key=lambda r: -r["score"])
                score_by_pool = 0.0
                for s in field_scores:
                    if s["query_term_index"] in consumed_index:
                        continue
                    nid = s["index_node_id"]
                    if nid in df_pool_by_id:
                        if df_pool_by_id[nid] <= 0:
                            continue
                        df_pool_by_id[nid] -= 1
                    else:
                        df_pool_by_id[nid] = s["term_frequency"] - 1
                    consumed_index.add(s["query_term_index"])
                    df = float(s["term_frequency"])
                    score_by_pool += (
                        min(s["score"] / df, 1.0) * s["term_frequency"]
                        / float(max(s["field_length"], s["all_query_terms_len"])))
                result[1] = max(score_by_pool, result[1])
        self.score_by_document_and_field = {}


class RefIndex:
    """Transcription of ``Index<T>`` (``/root/reference/src/index.rs``)."""

    def __init__(self, fields_num: int):
        self.docs: dict = {}  # key -> field_length list
        self.fields = [FieldDetails() for _ in range(fields_num)]
        self._uid = 0
        self.root = self._new_node("\0")
        self.removed: set = set()

    def _new_node(self, char: str) -> _Node:
        n = _Node(char, self._uid)
        self._uid += 1
        return n

    # -- build -------------------------------------------------------------

    def add_document(self, field_texts: list, tokenizer: Callable,
                     key) -> None:
        """``src/index.rs:77-158``.  ``field_texts`` = one string OR a
        list of strings per field (``FieldAccessor<D> -> Vec<&str>``,
        ``src/lib.rs:11``).  Multi-value quirks preserved exactly
        (``src/index.rs:90-116``): ``sum`` accumulates every value's
        kept-token count, but ``field_length[i]`` is *assigned* per
        value — the stored per-doc length is the LAST value's count."""
        field_length = [0] * len(self.fields)
        term_counts: dict[str, list[int]] = {}
        all_terms: list[str] = []
        for i in range(len(self.fields)):
            vals = field_texts[i]
            if isinstance(vals, str):
                vals = [vals]
            fd = self.fields[i]
            for val in vals:
                terms = tokenizer(val)
                cnt = 0
                for term in terms:
                    if term != "":
                        cnt += 1
                        all_terms.append(term)
                        counts = term_counts.setdefault(
                            term, [0] * len(self.fields))
                        counts[i] += 1
                fd.sum += cnt
                fd.avg = fd.sum / (len(self.docs) + 1.0)
                field_length[i] = cnt  # last value wins (src/index.rs:114)
        self.docs[key] = field_length
        for term in all_terms:
            node = self.root
            for i, ch in enumerate(term):
                nxt = None
                for c in node.children:
                    if c.char == ch:
                        nxt = c
                        break
                if nxt is None:
                    # create remaining chain (src/index.rs:437-452)
                    for ch2 in term[i:]:
                        child = self._new_node(ch2)
                        node.children.insert(0, child)  # prepend
                        node = child
                    break
                node = nxt
            node.postings.insert(0, (key, term_counts[term]))  # prepend

    # -- delete ------------------------------------------------------------

    def remove_document(self, key) -> None:
        """``src/index.rs:160-191`` — tombstone + immediate stat update."""
        if key not in self.docs:
            return
        self.removed.add(key)
        details = self.docs[key]
        new_len = float(len(self.docs) - 1)
        for i, fd in enumerate(self.fields):
            fl = details[i]
            if fl > 0:
                fd.sum -= fl
                fd.avg = fd.sum / new_len if new_len else float("nan")
        del self.docs[key]

    def vacuum(self) -> None:
        """``src/index.rs:193-241``."""
        removed = self.removed
        self._vacuum_node(self.root, removed)
        self.removed = set()

    def _vacuum_node(self, node: _Node, removed: set) -> int:
        node.postings = [p for p in node.postings if p[0] not in removed]
        ret = 1 if node.postings else 0
        keep = []
        for child in node.children:
            r = self._vacuum_node(child, removed)
            ret |= r
            if r:
                keep.append(child)
        node.children = keep
        return ret

    # -- lookup ------------------------------------------------------------

    def _find_node(self, term: str) -> Optional[_Node]:
        node = self.root
        for ch in term:
            nxt = None
            for c in node.children:
                if c.char == ch:
                    nxt = c
                    break
            if nxt is None:
                return None
            node = nxt
        return node

    def count_documents(self, node: _Node) -> int:
        """Occurrence-counted df, tombstone-aware (``src/index.rs:281-297``)."""
        return sum(1 for p in node.postings if p[0] not in self.removed)

    def expand_term(self, term: str) -> list[str]:
        """``src/query.rs:108-147`` — DFS, children newest-first."""
        node = self._find_node(term)
        results: list[str] = []
        if node is not None:
            self._expand_from(node, results, term)
        return results

    def _expand_from(self, node: _Node, results: list[str], term: str) -> None:
        if node.postings:
            results.append(term)
        for child in node.children:  # newest first
            self._expand_from(child, results, term + child.char)

    # -- query -------------------------------------------------------------

    def query(self, q: str, calculator: ScoreCalculator, tokenizer: Callable,
              fields_boost: list[float]) -> list[tuple]:
        """``src/query.rs:21-106``.  Returns [(key, score)] sorted by
        (score desc, key asc) — the canonical tie-break of the reference
        test harness (``src/lib.rs:53-58``)."""
        query_terms = tokenizer(q)
        scores: dict = {}
        query_terms_len = len(query_terms)  # includes empty tokens
        for qti, query_term in enumerate(query_terms):
            if query_term == "":
                continue
            expanded_terms = self.expand_term(query_term)
            visited: set = set()
            for expanded in expanded_terms:
                node = self._find_node(expanded)
                if node is None or not node.postings:
                    continue
                df = self.count_documents(node)
                if df <= 0:
                    continue
                td = TermData(qti, query_terms_len, query_term, expanded)
                pre = calculator.before_each(td, df, self.docs)
                for (key, tf) in node.postings:  # newest first
                    if key not in self.removed:
                        if isinstance(calculator, ZeroToOne):
                            calculator._current_key = key
                        s = calculator.score(
                            pre, tf, self.docs[key], node.uid,
                            fields_boost, self.fields, td)
                        if s is not None:
                            prev = scores.get(key)
                            if prev is None:
                                new = s
                            elif key in visited:
                                new = max(prev, s)
                            else:
                                new = prev + s
                            scores[key] = new
                    visited.add(key)
        results = [[k, v] for k, v in scores.items()]
        calculator.finalize(results)
        results.sort(key=lambda r: (-r[1], r[0]))
        return [(k, s) for k, s in results]
