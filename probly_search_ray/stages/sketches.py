"""Mergeable sketches for corpus-scale approximate statistics.

HyperLogLog distinct counting is the canonical one: per-batch register
vectors merge by ELEMENTWISE MAX, which makes the whole computation a
single `map_batches` (registers per key per batch) + one small
`groupby().map_groups` (max-merge + estimate) — the partial-aggregate
shape Ray Data wants, with per-key shuffle traffic of exactly
2^p bytes per (key, block) regardless of row count.  At 100 TB a
count-distinct over a hot key never materializes the key's rows
anywhere; the register rows are the only thing that moves.

Determinism: the hash is `pandas.util.hash_array` (stable across
processes), so the merged register vector — and therefore the
estimate — is EXACTLY reproducible for any block layout (max is
associative/commutative); a block-layout-invariance test pins this.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

HLL_P = 12                      # 2^12 = 4096 registers → ~1.6% stderr
HLL_M = 1 << HLL_P


def hll_registers(values: np.ndarray) -> np.ndarray:
    """uint8[HLL_M] register vector for one batch of (already
    key-grouped) values — fully vectorized: bucket = top p hash bits,
    rho = leading-zero count of the remaining 52 bits + 1 (computed
    with an exact float64 log2 — 52-bit ints convert losslessly)."""
    h = pd.util.hash_array(np.ascontiguousarray(values).astype(np.uint64))
    idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
    r = (h & np.uint64((1 << (64 - HLL_P)) - 1)).astype(np.uint64)
    bl = np.zeros(len(r), np.int64)
    nz = r > 0
    bl[nz] = np.floor(np.log2(r[nz].astype(np.float64))).astype(np.int64) + 1
    rho = ((64 - HLL_P) - bl + 1).astype(np.uint8)
    regs = np.zeros(HLL_M, dtype=np.uint8)
    o = np.argsort(idx, kind="stable")
    i_s, r_s = idx[o], rho[o]
    st = np.flatnonzero(np.concatenate(([True], i_s[1:] != i_s[:-1])))
    regs[i_s[st]] = np.maximum.reduceat(r_s, st)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range (linear counting)
    correction; large-range correction omitted (n ≪ 2^32 here)."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    z = 1.0 / np.sum(np.power(2.0, -regs.astype(np.float64)))
    e = alpha * m * m * z
    v = int((regs == 0).sum())
    if e <= 2.5 * m and v > 0:
        e = m * np.log(m / v)
    return float(e)


def hll_distinct(ds, key_col: str, value_col: str):
    """→ Dataset (key_col, est_distinct:int64): approximate distinct
    ``value_col`` per ``key_col`` via partial HLL registers + max-merge
    (shuffle moves one 4 KiB register row per (key, block))."""
    def partial(b: pa.Table) -> pa.Table:
        if not len(b):
            return pa.table({key_col: pa.array([], b[key_col].type),
                             "_regs": pa.array([], pa.binary())})
        keys = b[key_col].to_numpy(zero_copy_only=False)
        vals = b[value_col].to_numpy(zero_copy_only=False)
        o = np.argsort(keys, kind="stable")
        k_s, v_s = keys[o], vals[o]
        st = np.flatnonzero(np.concatenate(([True], k_s[1:] != k_s[:-1])))
        en = np.concatenate((st[1:], [len(k_s)]))
        out_k, out_r = [], []
        for s, e in zip(st, en):
            out_k.append(k_s[s])
            out_r.append(hll_registers(v_s[s:e]).tobytes())
        return pa.table({key_col: pa.array(out_k, b[key_col].type),
                         "_regs": pa.array(out_r, pa.binary())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        mat = np.frombuffer(b"".join(g["_regs"]), dtype=np.uint8) \
            .reshape(len(g), HLL_M)
        est = hll_estimate(mat.max(axis=0))
        return pd.DataFrame({key_col: [g[key_col].iloc[0]],
                             "est_distinct": [np.int64(round(est))]})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby(key_col).map_groups(merge, batch_format="pandas")


# --------------------------------------------------------------------------
# Heavy hitters: per-batch truncated exact counts with a Misra-Gries-style
# error bound.  The scale path for top_terms when the distinct-term vocab
# (10^10+ at 100 TB) exceeds worker memory: each batch ships only its top-m
# counter rows plus one sentinel row carrying the truncation cut, so the
# groupby key space is bounded by m·n_batches, not the vocab.
# --------------------------------------------------------------------------

def topk_terms_sketch(docs_ds, m: int = 4096, k: int = 20,
                      text_col: str = "text"):
    """→ (pandas top-k (term, df_lo, df_hi) by df_lo desc, certified).

    Per batch: exact token counts, truncated to the top ``m`` terms
    (ties: term asc); the (m+1)-th count is the batch's *cut* — any
    term dropped in that batch occurred ≤ cut times there.  After a
    groupby-sum, a term's true df lies in [df_lo, df_lo + Σ cuts of
    batches where it was absent] = [df_lo, df_hi].  ``certified`` is
    True iff the k-th df_lo ≥ every excluded term's df_hi (including
    never-seen terms, bounded by Σ cuts) — i.e. the top-k SET is
    provably exact, not just estimated.  Per-block top-k emission keeps
    the driver merge ≤ P·(k+1) rows."""
    from probly_search_ray.stages.textstats import _tokenize_flat

    def partial(b: pa.Table) -> pa.Table:
        toks, _, _ = _tokenize_flat(b, text_col)
        t, c = np.unique(toks, return_counts=True)  # term asc
        cut = np.int64(0)
        if len(t) > m:
            o = np.argsort(-c, kind="stable")[:m + 1]  # desc, term-asc ties
            cut = c[o[-1]]
            t, c = t[o[:m]], c[o[:m]]
        # sentinel row ("" can never be a real term: empties are dropped)
        return pa.table({
            "term": pa.array(np.concatenate((t, [""])).astype(object),
                             pa.string()),
            "cnt": pa.array(np.concatenate((c, [0])).astype(np.int64)),
            "cut": pa.array(np.concatenate(
                (np.full(len(t), cut), [cut])).astype(np.int64))})

    from ray.data.aggregate import Sum
    agg = docs_ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("cnt", alias_name="df_lo"),
                                   Sum("cut", alias_name="cut_seen"))

    def blk(df: pd.DataFrame) -> pd.DataFrame:
        """Per-block cut: the sentinel row (always kept), the block's
        top-(k+1) terms by (df_lo desc, term asc), and the block's
        excluded-term bound max(df_lo - cut_seen) folded into the
        ``exc`` column — so the driver merge is ≤ P·(k+3) rows while
        still bounding every term it never sees."""
        sent = df[df["term"] == ""]
        rest = df[df["term"] != ""].sort_values(
            ["df_lo", "term"], ascending=[False, True], kind="stable")
        head, tail = rest.head(k + 1), rest.iloc[k + 1:]
        exc = int(max(0, (tail["df_lo"] - tail["cut_seen"]).max())) \
            if len(tail) else 0
        out = pd.concat([sent, head], ignore_index=True)
        out["exc"] = np.int64(0)
        return pd.concat([out, pd.DataFrame(
            {"term": [""], "df_lo": [np.int64(0)],
             "cut_seen": [np.int64(0)], "exc": [np.int64(exc)]})],
            ignore_index=True)

    parts = agg.map_batches(blk, batch_format="pandas",
                            batch_size=None).to_pandas()
    sent = parts[parts["term"] == ""]
    total_cut = int(sent["cut_seen"].sum()) if len(sent) else 0
    exc_global = int(sent["exc"].max()) if len(sent) else 0
    parts = parts[parts["term"] != ""].copy()
    # true df ≤ df_lo + (cuts of batches that did NOT emit the term)
    parts["df_hi"] = parts["df_lo"] + (total_cut - parts["cut_seen"])
    parts = parts.sort_values(["df_lo", "term"], ascending=[False, True],
                              kind="stable").reset_index(drop=True)
    top = parts.head(k)
    excluded_hi = int(parts["df_hi"].iloc[k:].max()) if len(parts) > k else 0
    # block-excluded terms: df_hi ≤ exc_global + total_cut;
    # never-seen-anywhere terms: df ≤ total_cut
    excluded_hi = max(excluded_hi, exc_global + total_cut, total_cut)
    certified = bool(excluded_hi == 0 or (
        len(top) == k and top["df_lo"].iloc[k - 1] >= excluded_hi))
    out = top[["term", "df_lo", "df_hi"]].reset_index(drop=True)
    return out, certified


# --------------------------------------------------------------------------
# Exact grouped quantiles via counting histograms: for integer-valued
# metrics (token counts, byte lengths) the (key, value) space is tiny
# compared to the row count, so per-batch (key, value) → count partials
# + one small groupby give EXACT percentiles with no sort of the corpus.
# --------------------------------------------------------------------------

def grouped_quantiles(ds, key_col: str, val_fn, qs=(0.5, 0.9, 0.99)):
    """→ Dataset (key_col, q50, q90, ... int64): exact lower-nearest-rank
    quantiles (value at index ceil(q·n)-1 of the sorted values — DuckDB
    ``quantile_disc`` semantics) per key, via histogram partials.

    ``val_fn(batch) -> (keys ndarray, values int ndarray)`` extracts the
    metric; the shuffle moves (key, value, count) rows only."""
    def partial(b: pa.Table) -> pa.Table:
        keys, vals = val_fn(b)
        df = pd.DataFrame({"k": keys, "v": vals.astype(np.int64)})
        g = df.groupby(["k", "v"], as_index=False, sort=False).size()
        return pa.table({key_col: pa.array(g["k"]),
                         "v": pa.array(g["v"].to_numpy()),
                         "cnt": pa.array(g["size"].to_numpy(np.int64))})

    from ray.data.aggregate import Sum
    hist = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby([key_col, "v"]).aggregate(Sum("cnt", alias_name="n"))

    qcols = [f"q{int(q * 100)}" for q in qs]

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("v", kind="stable")
        c = g["n"].to_numpy().cumsum()
        n = c[-1]
        vals = g["v"].to_numpy()
        out = {key_col: [g[key_col].iloc[0]]}
        for q, qc in zip(qs, qcols):
            rank = max(int(np.ceil(q * n)), 1)  # 1-based lower nearest-rank
            out[qc] = [np.int64(vals[np.searchsorted(c, rank)])]
        return pd.DataFrame(out)

    return hist.groupby(key_col).map_groups(per_key, batch_format="pandas")
