"""Exact-phrase BM25 search (an extension — the reference's index has
no positions, ``/root/reference/src/index.rs:351-361`` stores only
per-field term frequencies, so phrase semantics can't come from its
posting lists either).

Design for 10^12 docs: the inverted index first narrows the corpus to
the CONJUNCTIVE candidate set (docs containing every phrase term —
O(min term df) ids via the engine's ``union_docs`` fan-out); the
adjacency check then runs as a streaming ``map_batches`` pass over the
corpus with the candidate-id set broadcast once (``ray.put``), so only
candidate docs pay the tokenize + position-compare cost and nothing
materializes on the driver except the final (doc, tf, len) rows —
whose count is bounded by the rarest term's df.  A positional-postings
sidecar would trade this corpus re-scan for index size; this layout
keeps the reference-faithful index untouched and is the standard
"positions-free phrase" fallback.

Scoring: BM25 treating the phrase as one pseudo-term — tf = number of
adjacent occurrences, df = occurrence-counted (Σ tf over docs,
mirroring the reference's df quirk, ``src/index.rs:281-297``), field
length / avg / N from the engine's global stats.  Tokenization is the
index's whitespace contract with empty tokens dropped (M2/M3), so the
verified positions agree byte-for-byte with what was indexed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _phrase_counts(batch: pa.Table, terms: list[str], cand_ref,
                   text_col: str, id_col: str) -> pa.Table:
    """Per-batch vectorized adjacency count: tokenize (whitespace,
    empties dropped), then AND together shifted equality masks — one
    C-level pass per phrase term, no Python over rows or tokens."""
    import ray
    cand = ray.get(cand_ref) if cand_ref is not None else None
    ids = batch[id_col].to_numpy()
    if cand is not None:
        keep = np.isin(ids, cand, assume_unique=False)
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "tf": pa.array([], pa.int64()),
                             "dl": pa.array([], pa.int64())})
        batch = batch.filter(pa.array(keep))
        ids = ids[keep]
    # null text ⇒ empty doc (matches the tokenizer contract); without
    # the fill a trailing null row puts len(flat) into off[:-1] and
    # np.add.reduceat raises IndexError
    from probly_search_ray.stages.textstats import _filled_text
    text = _filled_text(batch[text_col])
    toks = pc.split_pattern(text, " ")
    flat = toks.values
    nonempty = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
    off = toks.offsets.to_numpy()
    # drop empty tokens (M3) and rebuild per-doc offsets
    counts = np.add.reduceat(nonempty, off[:-1]) \
        if len(flat) else np.zeros(len(toks), np.int64)
    counts[off[:-1] == off[1:]] = 0  # reduceat repeats on empty lists
    flat = flat.filter(pa.array(nonempty))
    off2 = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    n = len(flat)
    L = len(terms)
    if n < L:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "tf": pa.array([], pa.int64()),
                         "dl": pa.array([], pa.int64())})
    # hit[i] = 1 iff terms match at flat positions i..i+L-1
    hit = np.ones(n, dtype=bool)
    for j, t in enumerate(terms):
        m = pc.equal(flat, t).to_numpy(zero_copy_only=False)
        hit[: n - j] &= m[j:]
    hit[n - L + 1:] = False
    # a match must not straddle a doc boundary: position i is valid only
    # if i+L-1 stays inside i's doc
    starts = off2[:-1]
    doc_of = np.repeat(np.arange(len(starts)), np.diff(off2))
    end_of = off2[1:][doc_of] if n else np.empty(0, np.int64)
    valid = (np.arange(n) + L) <= end_of
    hit &= valid
    cs = np.concatenate(([0], np.cumsum(hit)))
    tf = (cs[off2[1:]] - cs[off2[:-1]]).astype(np.int64)
    got = tf > 0
    return pa.table({id_col: pa.array(ids[got].astype(np.int64)),
                     "tf": pa.array(tf[got]),
                     "dl": pa.array(counts[got].astype(np.int64))})


def phrase_bm25(engine, docs_ds, phrase: str, text_col: str = "text",
                id_col: str = "doc_id", k1: float = 1.2, b: float = 0.75):
    """Distributed phrase search over ``docs_ds`` using ``engine``'s
    index for candidate pruning and global stats.  Returns a streaming
    Dataset (doc_id, score) — one row per doc containing the phrase,
    bounded by the rarest phrase term's df; the driver holds only the
    scalar phrase df (one ``sum`` aggregate over the verified rows)."""
    import math

    import ray

    def _empty():
        import pandas as pd
        return pd.DataFrame({id_col: pd.Series(dtype=np.int64),
                             "score": pd.Series(dtype=np.float64)})

    terms = [t for t in engine.tokenizer.py_fn(phrase) if t]
    if not terms:
        return _empty()
    cand = engine._conjunctive_candidates(terms, expand=False)
    if cand is not None and not len(cand):
        return _empty()
    cand_ref = ray.put(np.sort(cand.astype(np.int64))) \
        if cand is not None else None
    ver = docs_ds.map_batches(
        _phrase_counts, batch_format="pyarrow",
        fn_args=(terms, cand_ref, text_col, id_col)).materialize()
    df = int(ver.sum("tf") or 0)  # occurrence-counted (M8 quirk)
    if df == 0:
        return _empty()
    n_docs = engine.stats.num_docs
    avg = engine.stats.field_avg(0)
    freq = min(n_docs, df)
    idf = math.log(1.0 + (n_docs - freq + 0.5) / (freq + 0.5))
    b_ = b

    def score(batch: pa.Table) -> pa.Table:
        tf = batch["tf"].to_numpy().astype(np.float64)
        dl = batch["dl"].to_numpy().astype(np.float64)
        s = ((k1 + 1.0) * tf) / (
            k1 * ((1.0 - b_) + b_ * (dl / avg)) + tf) * idf
        return pa.table({id_col: batch[id_col],
                         "score": pa.array(np.round(s, 6))})

    return ver.map_batches(score, batch_format="pyarrow")
