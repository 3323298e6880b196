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
