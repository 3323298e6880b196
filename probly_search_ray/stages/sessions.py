"""Stream-shaped operators over the events log table.

Ray Data has no event-time window engine; the idiomatic mapping
(SURVEY.md §2.9 note) is: treat events as a partitioned log — partition
by key (`groupby(user_id)`), order by ts inside the group, and apply
the window logic with vectorized pandas per group.  Gap-based
sessionization is the canonical example.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize_group(g: pd.DataFrame, gap_minutes: int = 30) -> pd.DataFrame:
    g = g.sort_values("ts", kind="stable")
    ts = g["ts"].to_numpy()
    gap = np.timedelta64(gap_minutes * 60, "s")
    new_sess = np.ones(len(g), dtype=np.int64)
    if len(g) > 1:
        new_sess[1:] = (ts[1:] - ts[:-1] > gap).astype(np.int64)
    sess_id = np.cumsum(new_sess)
    out = g.assign(sess_id=sess_id).groupby("sess_id").agg(
        user_id=("user_id", "first"),
        session_start=("ts", "min"),
        n_events=("ts", "size"),
        sum_value=("value", "sum"),
    ).reset_index(drop=True)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(6)
    return out


def sessionize(events_ds, gap_minutes: int = 30):
    """→ Dataset (user_id, session_start, n_events, sum_value); one row
    per gap-separated session.  Tie-ordering within equal timestamps
    cannot change session membership (gap 0 never splits)."""
    return events_ds.groupby("user_id").map_groups(
        lambda g: sessionize_group(g, gap_minutes), batch_format="pandas")


def sessionize_sorted(events_ds, gap_minutes: int = 30) -> pd.DataFrame:
    """Sessionization without per-user Python: ONE global sort by
    (user_id, ts), a vectorized map_batches pass that collapses each
    batch into maximal session *segments* (start/end/count/sum), then a
    vectorized segment-level merge for sessions that span batch
    boundaries.  Per-row work is all C-level; the merge input is one
    row per segment (≈ #sessions), not per event.

    Scale note: the final merge runs on the driver over segments —
    fine while #sessions fits one node; beyond that, repartition the
    segment stream by user-range and apply the same merge per range.
    """
    import pyarrow as pa

    gap = np.timedelta64(gap_minutes * 60, "s")

    def partial(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_start": pa.array([], b["ts"].type),
                             "session_end": pa.array([], b["ts"].type),
                             "n_events": pa.array([], pa.int64()),
                             "sum_value": pa.array([], pa.float64())})
        u = b["user_id"].to_numpy()
        ts = b["ts"].to_numpy()
        v = b["value"].to_numpy()
        new = np.ones(len(u), dtype=bool)
        new[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap)
        starts = np.flatnonzero(new)
        ends = np.concatenate((starts[1:], [len(u)]))
        return pa.table({
            "user_id": pa.array(u[starts]),
            "session_start": pa.array(ts[starts]),
            "session_end": pa.array(ts[ends - 1]),
            "n_events": pa.array((ends - starts).astype(np.int64)),
            "sum_value": pa.array(np.add.reduceat(v, starts)
                                  .astype(np.float64)),
        })

    segs = events_ds.sort(["user_id", "ts"]) \
        .map_batches(partial, batch_format="pyarrow").to_pandas()
    if not len(segs):
        return pd.DataFrame({"user_id": pd.Series(dtype=np.int64),
                             "session_start": pd.Series(dtype="datetime64[us]"),
                             "n_events": pd.Series(dtype=np.int64),
                             "sum_value": pd.Series(dtype=np.float64)})
    # segments arrive in (user, ts) order (map_batches preserves row
    # order); merge boundary-split sessions vectorized at segment level
    u = segs["user_id"].to_numpy()
    st = segs["session_start"].to_numpy()
    en = segs["session_end"].to_numpy()
    new = np.ones(len(segs), dtype=bool)
    new[1:] = (u[1:] != u[:-1]) | (st[1:] - en[:-1] > gap)
    segs = segs.assign(_gid=np.cumsum(new))
    out = segs.groupby("_gid", as_index=False).agg(
        user_id=("user_id", "first"),
        session_start=("session_start", "min"),
        n_events=("n_events", "sum"),
        sum_value=("sum_value", "sum"),
    ).drop(columns=["_gid"])
    out["n_events"] = out["n_events"].astype(np.int64)
    out["sum_value"] = out["sum_value"].round(6)
    return out.reset_index(drop=True)
