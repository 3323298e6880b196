"""Distributed as-of join (the classic "latest right row at or before
each left row's timestamp, per key" temporal join — an operator Ray
Data lacks natively).

Shape (scale-safe; no driver state, no per-row Python):
  1. both sides are normalized to a shared narrow schema and tagged
     with a hash bucket (``key % num_buckets``) — payload columns ride
     along with dtype-stable zero sentinels on the other side (never
     read; avoids nullable-int → float mangling through pandas);
  2. ONE hash-partitioned shuffle co-locates each key's rows
     (``groupby(bucket).map_groups``, the same fixed-partition idiom
     as sessionization/dedup);
  3. per bucket, a single ``np.lexsort`` by (key, ts, side, tie)
     followed by a vectorized forward-fill of right-row indices
     (``np.maximum.accumulate``) matches every left row to its as-of
     right row; a key-equality check on the filled index handles the
     per-key reset for free, because same-key rows are contiguous.

Semantics are deterministic under timestamp ties: right rows at the
same (key, ts) are ordered by ``right_tie`` ascending, so the match is
the MAX (ts, tie) right row with ``right_ts <= left_ts`` (inclusive).
Unmatched left rows are dropped (inner as-of).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _normalize(key_col: str, ts_col: str, side: int, num_buckets: int,
               keep: list[str], zero_schema: pa.Schema):
    """map_batches fn → shared-schema table: (_ub,_k,_ts,_tie,_side,
    *payload).  ``keep`` are this side's payload columns; every other
    payload field in ``zero_schema`` is filled with dtype-stable
    zeros."""
    def f(b: pa.Table) -> pa.Table:
        n = len(b)
        k = b[key_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = b[ts_col].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        cols = {
            "_ub": pa.array((k % num_buckets).astype(np.int64)),
            "_k": pa.array(k),
            "_ts": pa.array(ts),
            "_side": pa.array(np.full(n, side, np.int8)),
        }
        for field in zero_schema:
            if field.name in keep:
                cols[field.name] = b[field.name].cast(field.type)
            elif pa.types.is_string(field.type):
                cols[field.name] = pa.array([""] * n, field.type)
            else:
                cols[field.name] = pa.array(
                    np.zeros(n, dtype=field.type.to_pandas_dtype()),
                    field.type)
        return pa.table(cols)
    return f


def asof_join(left_ds, right_ds, *, left_key: str, left_ts: str,
              right_key: str, right_ts: str, left_cols: list[str],
              right_cols: list[str], right_tie: str,
              num_buckets: int = 64):
    """→ Dataset with ``left_cols + right_cols``: for each left row,
    the right row with the greatest ``(right_ts, right_tie)`` among
    rows with the same key and ``right_ts <= left_ts``."""
    import pyarrow as _pa

    l_schema = left_ds.schema()
    r_schema = right_ds.schema()

    def _t(schema, name):
        # ray.data.Schema normalizes names/types to pyarrow regardless
        # of the underlying block format (arrow or pandas)
        return dict(zip(schema.names, schema.types))[name]

    payload = _pa.schema(
        [_pa.field(c, _t(l_schema, c)) for c in left_cols] +
        [_pa.field(c, _t(r_schema, c)) for c in right_cols] +
        [_pa.field("_tie", _pa.int64())])

    ln = left_ds.map_batches(
        _normalize(left_key, left_ts, 1, num_buckets, left_cols, payload),
        batch_format="pyarrow")
    # the tie column doubles as the right payload's ordering key
    rn = right_ds.map_batches(
        lambda b: b.append_column(
            "_tie", b[right_tie].cast(_pa.int64())),
        batch_format="pyarrow").map_batches(
        _normalize(right_key, right_ts, 0, num_buckets,
                   right_cols + ["_tie"], payload),
        batch_format="pyarrow")

    out_cols = list(left_cols) + list(right_cols)

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({c: pd.Series(dtype=g[c].dtype)
                                 for c in out_cols})
        k = g["_k"].to_numpy()
        ts = g["_ts"].to_numpy()
        tie = g["_tie"].to_numpy()
        side = g["_side"].to_numpy()
        order = np.lexsort((tie, side, ts, k))
        k_s, side_s = k[order], side[order]
        n = len(g)
        ridx = np.where(side_s == 0, np.arange(n), -1)
        last_r = np.maximum.accumulate(ridx)
        is_left = side_s == 1
        ok = is_left & (last_r >= 0)
        ok[ok] = k_s[last_r[ok]] == k_s[ok]
        li = order[ok]              # original rows of matched left rows
        ri = order[last_r[ok]]      # original rows of their as-of match
        out = {}
        for c in left_cols:
            out[c] = g[c].to_numpy()[li]
        for c in right_cols:
            out[c] = g[c].to_numpy()[ri]
        return pd.DataFrame(out)

    return ln.union(rn).groupby("_ub").map_groups(
        merge_bucket, batch_format="pandas")


def range_join_agg(left_ds, right_ds, *, left_key: str, left_ts: str,
                   right_key: str, right_ts: str, left_id: str,
                   right_val: str, window_us: int,
                   num_buckets: int = 64):
    """Trailing-window interval join + aggregate: for each left row,
    the COUNT and SUM(``right_val``) of right rows with the same key
    and ``right_ts`` in ``[left_ts - window, left_ts]`` (inclusive).
    → Dataset (left_id, n_matched, sum_val); left rows with an empty
    window are kept with zeros (left semantics).

    Same partitioning contract as ``asof_join`` (one hash shuffle),
    but the per-bucket kernel is a SWEEP: each left row becomes two
    boundary markers (window-lo sorts before, window-hi after, right
    rows at the same timestamp), one lexsort orders (key, ts, marker),
    and running cumsums of right count/value make every window
    aggregate a difference of two gathered prefix values — O(n log n)
    per bucket, zero per-row Python."""
    def norm_left(b: pa.Table) -> pa.Table:
        k = b[left_key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = b[left_ts].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        ev = b[left_id].cast(pa.int64()).to_numpy(zero_copy_only=False)
        n = len(b)
        k2 = np.concatenate((k, k))
        return pa.table({
            "_ub": pa.array((k2 % num_buckets).astype(np.int64)),
            "_k": pa.array(k2),
            "_ts": pa.array(np.concatenate((ts - window_us, ts))),
            "_m": pa.array(np.concatenate((
                np.zeros(n, np.int8), np.full(n, 2, np.int8)))),
            "_id": pa.array(np.concatenate((ev, ev))),
            "_val": pa.array(np.zeros(2 * n, np.float64)),
        })

    def norm_right(b: pa.Table) -> pa.Table:
        k = b[right_key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = b[right_ts].cast(pa.timestamp("us")).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        v = b[right_val].cast(pa.float64()).to_numpy(zero_copy_only=False)
        n = len(b)
        return pa.table({
            "_ub": pa.array((k % num_buckets).astype(np.int64)),
            "_k": pa.array(k),
            "_ts": pa.array(ts),
            "_m": pa.array(np.ones(n, np.int8)),
            "_id": pa.array(np.zeros(n, np.int64)),
            "_val": pa.array(v),
        })

    def sweep_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame({
                "_lid": pd.Series(dtype=np.int64),
                "n_matched": pd.Series(dtype=np.int64),
                "sum_val": pd.Series(dtype=np.float64)})
        k = g["_k"].to_numpy()
        ts = g["_ts"].to_numpy()
        m = g["_m"].to_numpy()
        order = np.lexsort((m, ts, k))
        m_s = m[order]
        is_r = m_s == 1
        val_s = g["_val"].to_numpy()[order]
        cnt = np.cumsum(is_r)
        sm = np.cumsum(np.where(is_r, val_s, 0.0))
        ev_s = g["_id"].to_numpy()[order]
        lo_p = np.flatnonzero(m_s == 0)
        hi_p = np.flatnonzero(m_s == 2)
        # pair lo/hi markers of the same left row by its unique id
        lo_o = lo_p[np.argsort(ev_s[lo_p])]
        hi_o = hi_p[np.argsort(ev_s[hi_p])]
        return pd.DataFrame({
            "_lid": ev_s[hi_o],
            "n_matched": (cnt[hi_o] - cnt[lo_o]).astype(np.int64),
            "sum_val": (sm[hi_o] - sm[lo_o]).round(6),
        })

    ln = left_ds.map_batches(norm_left, batch_format="pyarrow")
    rn = right_ds.map_batches(norm_right, batch_format="pyarrow")
    out = ln.union(rn).groupby("_ub").map_groups(
        sweep_bucket, batch_format="pandas")
    return out.map_batches(
        lambda b: b.rename_columns([left_id, "n_matched", "sum_val"]),
        batch_format="pyarrow")
