"""Training-data curation operators beyond the reference engine.

The reference (`/root/reference`) is a search library; a 100 TB
training-data pipeline additionally needs corpus-curation primitives.
This module adds the next tranche (round 3) on top of
``stages/dedup.py`` / ``stages/textstats.py``:

- benchmark decontamination (n-gram overlap vs a broadcast eval set)
- pattern redaction (PII-style regex scrub, C-level RE2 kernels)
- repetition statistics (Gopher-style top-token / top-bigram fractions)
- unigram-LM log-probability scoring (perplexity-proxy quality signal)
- token-budget shard packing (distributed prefix-sum scan)
- deterministic stratified sampling (arithmetic hash, SQL-replicable)

Every operator is a vectorized ``map_batches`` transform over
``batch_format="pyarrow"`` batches; small sides (the benchmark n-gram
set, the per-block prefix offsets, the vocabulary log-prob table) are
broadcast once via ``ray.put`` and looked up with ``np.searchsorted``
— never re-shipped per batch and never a shuffle join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

from probly_search_ray.functions.hashing import hash_tokens_u64, shingle_hashes
from probly_search_ray.stages.textstats import _tokenize_flat

# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------

# shingle width for contamination checks (token n-grams)
DECONTAM_W = 5


def _doc_shingle_hashes(batch: pa.Table, w: int):
    """(shingle hashes concat, per-doc shingle counts) for a batch."""
    toks, lens, _ = _tokenize_flat(batch)
    h = hash_tokens_u64(toks) if len(toks) else np.empty(0, np.uint64)
    return shingle_hashes(h, lens, w=w)


def benchmark_ngram_set(docs, bench_mod: int, w: int = DECONTAM_W) -> np.ndarray:
    """Distinct n-gram hashes of the benchmark subset (docs whose
    ``doc_id % bench_mod == 0``), as a sorted uint64 array.

    The eval/benchmark set is the SMALL side by definition (it is the
    thing you must be able to broadcast to every worker); each batch
    emits only its distinct hashes, the driver unions P small arrays.
    """
    def part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        t = b.filter(pa.array(ids % bench_mod == 0))
        if not len(t):
            return pa.table({"h": pa.array([], pa.uint64())})
        sh, _ = _doc_shingle_hashes(t, w)
        return pa.table({"h": pa.array(np.unique(sh), pa.uint64())})

    parts = docs.map_batches(part, batch_format="pyarrow").to_pandas()
    if "h" not in parts.columns:
        # every batch was empty-of-benchmark-shingles: Ray's to_pandas
        # drops the schema of an all-empty dataset, and the benchmark
        # set is legitimately empty (e.g. all bench docs shorter than w)
        return np.empty(0, np.uint64)
    return np.unique(parts["h"].to_numpy().astype(np.uint64))


def decontaminate(docs, bench_mod: int = 29, w: int = DECONTAM_W):
    """Benchmark-decontamination flags: for every non-benchmark doc,
    the number of its distinct w-gram token n-grams that also occur in
    the benchmark subset (``doc_id % bench_mod == 0``), and a 0/1
    contamination flag (any overlap).

    Two passes: (1) build + broadcast the benchmark n-gram hash set,
    (2) one vectorized corpus pass counting per-doc distinct-hash
    membership with ``np.searchsorted``.  64-bit shingle hashes stand
    in for the n-gram strings on both sides (collision odds ≈
    n²/2⁻⁶⁵ — negligible against exact-string distinct counts).
    """
    bench = benchmark_ngram_set(docs, bench_mod, w)
    ref = ray.put(bench)

    def score(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].to_numpy()
        t = b.filter(pa.array(ids % bench_mod != 0))
        if not len(t):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_overlap": pa.array([], pa.int64()),
                             "contaminated": pa.array([], pa.int64())})
        sh, n_sh = _doc_shingle_hashes(t, w)
        didx = np.repeat(np.arange(len(t), dtype=np.int64), n_sh)
        n_ov = np.zeros(len(t), dtype=np.int64)
        if len(sh):
            order = np.lexsort((sh, didx))
            ss, dd = sh[order], didx[order]
            first = np.concatenate(
                ([True], (dd[1:] != dd[:-1]) | (ss[1:] != ss[:-1])))
            su, du = ss[first], dd[first]
            bset = ray.get(ref)
            if len(bset):
                pos = np.searchsorted(bset, su)
                hit = (pos < len(bset)) & \
                    (bset[np.minimum(pos, len(bset) - 1)] == su)
                n_ov = np.bincount(du[hit], minlength=len(t)).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_overlap": pa.array(n_ov, pa.int64()),
            "contaminated": pa.array((n_ov > 0).astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# pattern redaction (PII-style scrub)
# ---------------------------------------------------------------------------

# demo pattern over the synthetic vocabulary; real deployments pass
# email/phone/ssn alternations — the kernels are pattern-agnostic RE2
DEFAULT_REDACT_PATTERN = r"\b(customer|supplier)\b"
REDACT_TOKEN = "[REDACTED]"


def redact_patterns(docs, pattern: str = DEFAULT_REDACT_PATTERN,
                    replacement: str = REDACT_TOKEN):
    """Regex redaction: per doc, the number of matches removed and the
    scrubbed text.  Both kernels (`count_substring_regex`,
    `replace_substring_regex`) are C-level RE2 over the whole column —
    no per-row Python, no actor state needed."""
    def scrub(b: pa.Table) -> pa.Table:
        from probly_search_ray.stages.textstats import _filled_text
        col = _filled_text(b["text"])
        n = pc.cast(pc.count_substring_regex(col, pattern), pa.int64())
        clean = pc.replace_substring_regex(col, pattern, replacement)
        return pa.table({"doc_id": b["doc_id"], "n_redacted": n,
                         "text_clean": clean})

    return docs.map_batches(scrub, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# repetition statistics (Gopher-style quality filters)
# ---------------------------------------------------------------------------

_BIGRAM_MIX = np.uint64(0x9E3779B97F4A7C15)


def _per_group_max_counts(keys: np.ndarray, didx: np.ndarray,
                          n_rows: int) -> np.ndarray:
    """max multiplicity of any key within each doc (vectorized:
    lexsort → run lengths → per-doc ``maximum.reduceat``)."""
    out = np.zeros(n_rows, dtype=np.int64)
    if not len(keys):
        return out
    order = np.lexsort((keys, didx))
    ks, dd = keys[order], didx[order]
    new = np.concatenate(([True], (dd[1:] != dd[:-1]) | (ks[1:] != ks[:-1])))
    starts = np.flatnonzero(new)
    cnt = np.diff(np.append(starts, len(ks)))
    gdoc = dd[starts]
    dnew = np.concatenate(([True], gdoc[1:] != gdoc[:-1]))
    dstarts = np.flatnonzero(dnew)
    out[gdoc[dstarts]] = np.maximum.reduceat(cnt, dstarts)
    return out


def repetition_stats(docs):
    """Per-doc repetition fractions (the Gopher-repetition family
    adapted to single-line docs): fraction of tokens taken by the most
    frequent token, and fraction of adjacent bigrams taken by the most
    frequent bigram.  High values ⇒ boilerplate / degenerate text."""
    def stats(b: pa.Table) -> pa.Table:
        toks, lens, didx = _tokenize_flat(b)
        n = len(b)
        h = hash_tokens_u64(toks) if len(toks) else np.empty(0, np.uint64)
        top_tok = _per_group_max_counts(h, didx, n)
        m = didx[1:] == didx[:-1] if len(toks) else np.empty(0, bool)
        bh = (h[:-1][m] * _BIGRAM_MIX) ^ h[1:][m]
        top_big = _per_group_max_counts(bh, didx[:-1][m] if len(toks) else
                                        np.empty(0, np.int64), n)
        tok_frac = top_tok / np.maximum(lens, 1)
        big_frac = top_big / np.maximum(lens - 1, 1)
        return pa.table({
            "doc_id": b["doc_id"],
            "top_token_frac": pa.array(np.round(tok_frac, 6)),
            "top_bigram_frac": pa.array(np.round(big_frac, 6)),
        })

    return docs.map_batches(stats, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# unigram-LM log-probability (perplexity proxy)
# ---------------------------------------------------------------------------

def unigram_logprob(docs, freq_df: pd.DataFrame):
    """Per-doc mean unigram log-probability under the corpus LM
    (p(t) = occurrences of t / total tokens) — the classic cheap
    perplexity proxy for quality filtering.

    ``freq_df`` is the (term, df) occurrence table — computed
    DISTRIBUTED upstream (partial per-batch counts + one groupby-sum;
    see ``pipelines.queries.term_df``) and handed over as the SMALL
    side: vocabulary ≪ corpus, broadcast once via ``ray.put``, looked
    up per batch with ``np.searchsorted``."""
    terms = freq_df["term"].to_numpy().astype(object)
    counts = freq_df["df"].to_numpy().astype(np.float64)
    order = np.argsort(terms)
    terms_sorted = terms[order]
    logp_sorted = np.log(counts[order] / counts.sum())
    ref = ray.put((terms_sorted, logp_sorted))

    def score(b: pa.Table) -> pa.Table:
        ts, lp = ray.get(ref)
        toks, lens, didx = _tokenize_flat(b)
        n = len(b)
        sums = np.zeros(n, dtype=np.float64)
        if len(toks):
            sums = np.bincount(didx, weights=lp[np.searchsorted(ts, toks)],
                               minlength=n)
        keep = lens > 0
        return pa.table({
            "doc_id": b["doc_id"].to_numpy()[keep],
            "logprob": pa.array(np.round(sums[keep] / lens[keep], 6)),
        })

    return docs.map_batches(score, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# token-budget shard packing (distributed prefix-sum scan)
# ---------------------------------------------------------------------------

def pack_shards(docs, budget: int = 2000):
    """Sequential token-budget packing: in doc_id order, assign each
    doc to shard ``floor(tokens_before_doc / budget)`` — the
    deterministic contract for slicing a corpus into fixed-token
    training shards.

    A global scan needs a prefix sum, done the two-pass way: sort by
    doc_id (range shuffle), materialize the blocks, pass 1 emits one
    (first_doc_id, token_sum) row PER BLOCK (``batch_size=None``),
    the driver prefix-sums the P-row table into per-block offsets
    (broadcast in the task closure), pass 2 adds the in-block
    exclusive cumsum.  Both passes map over the SAME materialized
    blocks, so block identity (and in-block row order) is stable.
    Driver state is O(#blocks), never O(#docs)."""
    sorted_ds = docs.sort("doc_id").materialize()

    def block_sum(b: pa.Table) -> pa.Table:
        if not len(b):
            return pa.table({"first_doc": pa.array([], pa.int64()),
                             "tok": pa.array([], pa.int64())})
        _, lens, _ = _tokenize_flat(b)
        return pa.table({"first_doc": [int(b["doc_id"][0].as_py())],
                         "tok": [int(lens.sum())]})

    parts = sorted_ds.map_batches(block_sum, batch_format="pyarrow",
                                  batch_size=None).to_pandas()
    parts = parts.sort_values("first_doc")
    offsets = dict(zip(parts["first_doc"].astype(np.int64),
                       parts["tok"].cumsum().shift(fill_value=0)
                       .astype(np.int64)))

    def assign(b: pa.Table) -> pa.Table:
        if not len(b):
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "shard_id": pa.array([], pa.int64())})
        _, lens, _ = _tokenize_flat(b)
        start = offsets[int(b["doc_id"][0].as_py())]
        cum_prev = start + np.cumsum(lens) - lens
        return pa.table({"doc_id": b["doc_id"],
                         "n_tokens": pa.array(lens, pa.int64()),
                         "shard_id": pa.array(cum_prev // budget,
                                              pa.int64())})

    return sorted_ds.map_batches(assign, batch_format="pyarrow",
                                 batch_size=None)


# ---------------------------------------------------------------------------
# deterministic stratified sampling
# ---------------------------------------------------------------------------

SAMPLE_MULT = np.uint64(2654435761)   # Knuth multiplicative constant
SAMPLE_MASK = np.uint64(4294967296)   # 2^32


def sample_mask(doc_ids: np.ndarray, mod: int = 10, keep: int = 3) -> np.ndarray:
    """Deterministic keep mask: multiplicative hash of doc_id mod 2^32,
    keep the ``keep``-th residue class of ``mod`` (a mod-fraction
    sample).  Pure integer arithmetic so ANY engine (here: DuckDB
    HUGEINT) reproduces the identical sample — the property that makes
    cross-system pipeline reruns consistent."""
    ids = doc_ids.astype(np.uint64)
    h = ((ids % SAMPLE_MASK) * SAMPLE_MULT) % SAMPLE_MASK
    return (h % np.uint64(mod)) == np.uint64(keep)


def sample_stratified(docs, mod: int = 10, keep: int = 3):
    """Per-source sampled/total counts under the deterministic hash
    sample — one pass, in-batch combiner, tiny groupby-sum shuffle
    (one row per (block, source))."""
    from ray.data.aggregate import Sum

    def part(b: pa.Table) -> pa.Table:
        k = sample_mask(b["doc_id"].to_numpy())
        src = b["source"]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        d = src.dictionary_encode()
        codes = d.indices.to_numpy(zero_copy_only=False)
        nsrc = len(d.dictionary)
        tot = np.bincount(codes, minlength=nsrc).astype(np.int64)
        smp = np.bincount(codes, weights=k.astype(np.float64),
                          minlength=nsrc).astype(np.int64)
        return pa.table({"source": d.dictionary,
                         "n_total_p": pa.array(tot),
                         "n_sampled_p": pa.array(smp)})

    return docs.map_batches(part, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("n_total_p", alias_name="n_total"),
                                     Sum("n_sampled_p",
                                         alias_name="n_sampled"))


# ---------------------------------------------------------------------------
# per-source quota cap (domain-cap curation)
# ---------------------------------------------------------------------------

def source_quota(docs, n: int = 30, source_col: str = "source",
                 id_col: str = "doc_id", merge_buckets: int = 64):
    """Keep the ``n`` lowest-``id_col`` docs per source — the "cap docs
    per domain" curation step every Common-Crawl pipeline runs so one
    hot host can't dominate the corpus.

    Scale shape (two stages, both vectorized):

    1. per-BLOCK combiner: each block keeps ≤ n rows per source via one
       lexsort + grouped-rank mask — survivors are ≤ blocks·n per
       source, independent of corpus size;
    2. the survivors hash-shuffle by source bucket (a source lives in
       exactly one bucket) and each bucket replays the same rank filter
       over ALL its sources at once — exact, no per-source Python, and
       the worst skew (every doc one source) is bounded by blocks·n
       rows in one bucket, never the corpus.

    The driver holds nothing; the result is a streaming Dataset of
    (id, source) survivors.
    """
    def _rank_mask(src_codes: np.ndarray, ids: np.ndarray) -> np.ndarray:
        order = np.lexsort((ids, src_codes))
        sc = src_codes[order]
        starts = np.concatenate(([0], np.flatnonzero(sc[1:] != sc[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [len(sc)])))
        rank = np.arange(len(sc)) - np.repeat(starts, counts)
        keep = np.zeros(len(sc), dtype=bool)
        keep[order] = rank < n
        return keep

    def combine(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            # schema must match the non-empty branch (incl. _sb) or the
            # downstream groupby sees mixed block schemas
            return pa.table({id_col: pa.array([], pa.int64()),
                             source_col: pa.array([], pa.string()),
                             "_sb": pa.array([], pa.int64())})
        src = b[source_col]
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        codes = src.dictionary_encode().indices.to_numpy(
            zero_copy_only=False).astype(np.int64)
        ids = b[id_col].to_numpy()
        keep = _rank_mask(codes, ids)
        out = b.select([id_col, source_col]).filter(pa.array(keep))
        bucket = pd.util.hash_array(
            np.asarray(out[source_col].to_pandas(), dtype=object)
        ) % merge_buckets
        return out.append_column("_sb", pa.array(bucket.astype(np.int64)))

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        codes, _ = pd.factorize(g[source_col], sort=False)
        keep = _rank_mask(codes.astype(np.int64),
                          g[id_col].to_numpy())
        return g.loc[keep, [id_col, source_col]]

    return docs.map_batches(combine, batch_format="pyarrow") \
        .groupby("_sb").map_groups(resolve, batch_format="pandas")
