"""Text analysis stages for training-data pipelines.

All stages are vectorized ``map_batches`` transforms over
``batch_format="pyarrow"`` batches of a documents table
(``doc_id, text, ...``): tokenization via Arrow kernels, aggregation
via numpy reduceat — no Python loop over rows in any hot path.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from probly_search_ray.functions.hashing import (
    hash_tokens_u64, rolling_fingerprint, simhash64)

DEFAULT_STOPWORDS = ("the", "a", "and", "of", "to")

# tiny per-language stopword profiles for the heuristic language id
LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it"},
    "de": {"der", "die", "und", "das", "ist", "von", "zu", "ein"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "es"},
    "fr": {"le", "la", "de", "et", "un", "est", "en", "que"},
    "zh": {"的", "是", "了", "在", "我", "有", "和", "不"},
}


def _filled_text(col) -> pa.Array:
    """String column with nulls replaced by '' — null-type-safe: a
    block whose every value is null arrives as Arrow type ``null``
    (e.g. an all-None object column through ``from_pandas``), where
    ``fill_null("")`` raises ArrowInvalid instead of filling."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_null(col.type):
        return pa.array([""] * len(col), pa.string())
    return col.fill_null("")


def _tokenize_flat(batch: pa.Table, text_col: str = "text"):
    """→ (token strings np array, doc lengths np array) with empty
    tokens dropped (reference tokenizer contract)."""
    col = _filled_text(batch[text_col])
    lst = pc.split_pattern(col, " ")
    offsets = lst.offsets.to_numpy()
    counts = np.diff(offsets)
    values = lst.values
    keep = pc.not_equal(values, "").to_numpy(zero_copy_only=False)
    didx = np.repeat(np.arange(len(batch), dtype=np.int64), counts)[keep]
    toks = values.filter(pa.array(keep)).to_numpy(zero_copy_only=False)
    lens = np.bincount(didx, minlength=len(batch)).astype(np.int64)
    return toks, lens, didx


def doc_lengths(batch: pa.Table) -> pa.Table:
    _, lens, _ = _tokenize_flat(batch)
    return pa.table({"doc_id": batch["doc_id"],
                     "len": pa.array(lens, type=pa.int64())})


def token_stats(batch: pa.Table) -> pa.Table:
    toks, lens, didx = _tokenize_flat(batch)
    n = len(batch)
    starts = np.cumsum(lens) - lens
    uniq = np.zeros(n, dtype=np.int64)
    if len(toks):
        h = hash_tokens_u64(toks)
        order = np.lexsort((h, didx))
        hs, ds = h[order], didx[order]
        newgrp = np.concatenate(([True], (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])))
        uniq = np.bincount(ds[newgrp], minlength=n).astype(np.int64)
    return pa.table({"doc_id": batch["doc_id"],
                     "n_tokens": pa.array(lens, type=pa.int64()),
                     "n_unique": pa.array(uniq, type=pa.int64())})


class QualityScore:
    """Quality signals: token count, stopword ratio, mean token length.
    Stopword set compiled once per actor."""

    def __init__(self, stopwords=DEFAULT_STOPWORDS):
        self.stopwords = np.asarray(sorted(stopwords))

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, lens, didx = _tokenize_flat(batch)
        n = len(batch)
        stop_cnt = np.zeros(n, dtype=np.int64)
        tok_bytes = np.zeros(n, dtype=np.int64)
        if len(toks):
            is_stop = np.isin(toks, self.stopwords)
            stop_cnt = np.bincount(didx[is_stop], minlength=n).astype(np.int64)
            blens = np.char.str_len(toks.astype(np.str_)).astype(np.int64)
            tok_bytes = np.bincount(didx, weights=blens, minlength=n).astype(np.int64)
        denom = np.maximum(lens, 1).astype(np.float64)
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_tokens": pa.array(lens, type=pa.int64()),
            "stopword_ratio": pa.array(np.round(stop_cnt / denom, 6)),
            "avg_token_len": pa.array(np.round(tok_bytes / denom, 6)),
        })


class LangId:
    """Heuristic language id: argmax of per-language stopword hit
    counts (ties → 'und').  Profiles compiled once per actor."""

    def __init__(self, profiles=None):
        profiles = profiles or LANG_PROFILES
        self.langs = sorted(profiles)
        self.sets = [np.asarray(sorted(profiles[l])) for l in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        toks, lens, didx = _tokenize_flat(batch)
        n = len(batch)
        scores = np.zeros((n, len(self.langs)), dtype=np.int64)
        if len(toks):
            for li, sw in enumerate(self.sets):
                hit = np.isin(toks, sw)
                scores[:, li] = np.bincount(didx[hit], minlength=n)
        best = np.argmax(scores, axis=1)
        best_val = scores[np.arange(n), best]
        pred = np.where(best_val > 0, np.asarray(self.langs)[best], "und")
        return pa.table({"doc_id": batch["doc_id"],
                         "pred_lang": pa.array(pred.astype(object))})


def fingerprints(batch: pa.Table) -> pa.Table:
    """Rolling-hash document fingerprint (order-sensitive)."""
    toks, lens, _ = _tokenize_flat(batch)
    h = hash_tokens_u64(toks) if len(toks) else np.empty(0, np.uint64)
    fp = rolling_fingerprint(h, lens)
    return pa.table({"doc_id": batch["doc_id"],
                     "fingerprint": pa.array(fp, type=pa.uint64())})


def simhash_stage(batch: pa.Table) -> pa.Table:
    toks, lens, _ = _tokenize_flat(batch)
    h = hash_tokens_u64(toks) if len(toks) else np.empty(0, np.uint64)
    sh = simhash64(h, lens)
    return pa.table({"doc_id": batch["doc_id"],
                     "simhash": pa.array(sh, type=pa.uint64())})
