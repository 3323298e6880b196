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
