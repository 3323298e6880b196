"""String (url) document keys over the uint64-keyed engine core.

The reference index is generic over the key type (``T: Eq + Hash +
Copy``, ``/root/reference/src/index.rs:35``); this engine's on-disk
postings are uint64-keyed.  String keys are supported by a *keymap
sidecar*: every string key is hashed to a deterministic uint64 doc_id
(pandas' vectorized 64-bit siphash — stable across runs and
processes), the (key, doc_id) mapping is written as partitioned
parquet next to the index, and query results are joined back to keys
with a predicate-pushdown read of just the result ids.

Determinism note: the engine's insertion order is ascending doc_id, so
a string-keyed corpus has a deterministic (hash-ordered) insertion
order — reference-parity differentials model it by adding docs to the
refmodel in ascending-hash order.

Collisions: 64-bit hashes over n keys collide with probability
~n²/2^65 (≈3% at 10^12 docs); ``check_collisions`` finds any
doc_id claimed by two different keys via a C-level groupby so callers
can reject/salt the offending keys.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.dataset as pads


def hash_keys(keys) -> np.ndarray:
    """Deterministic uint64 ids for an array of string keys."""
    arr = np.asarray(keys, dtype=object)
    return pd.util.hash_array(arr)


def keymap_dir(index_dir: str) -> str:
    return os.path.join(index_dir, "keymap")


def add_doc_ids(batch: pa.Table, key_col: str) -> pa.Table:
    """map_batches stage: attach a ``doc_id`` column hashed from the
    string key column (vectorized)."""
    keys = batch[key_col].to_numpy(zero_copy_only=False)
    ids = hash_keys(keys)
    return batch.append_column("doc_id", pa.array(ids, type=pa.uint64()))


def write_keymap(ds, key_col: str, index_dir: str,
                 group: str | None = None) -> int:
    """Write the (key, doc_id) sidecar as partitioned parquet (one dir
    per build group — same resumability unit as the index); returns the
    row count.  Streaming — no driver materialization."""
    out = keymap_dir(index_dir)
    if group is not None:
        out = os.path.join(out, f"group={group}")
    mapped = ds.map_batches(
        lambda b: pa.table({key_col: b[key_col],
                            "doc_id": add_doc_ids(b, key_col)["doc_id"]}),
        batch_format="pyarrow")
    mapped.write_parquet(out)
    return pads.dataset(sorted(glob.glob(
        os.path.join(out, "*.parquet")))).count_rows()


def _files(index_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(keymap_dir(index_dir),
                                         "**", "*.parquet"), recursive=True))


def check_collisions(index_dir: str, key_col: str) -> pd.DataFrame:
    """doc_ids claimed by >1 distinct key (expected empty) — a
    DISTRIBUTED check: the sidecar streams through one Ray groupby.
    Distinctness of keys within a doc_id group is detected by comparing
    Min/Max of an independent second key hash (a true collision with a
    matching second hash has probability ~2⁻⁶⁴ per pair and the final
    pushdown re-read verifies the tiny suspect set exactly); the driver
    holds only the suspect rows."""
    import ray.data
    from ray.data.aggregate import Max, Min

    from probly_search_ray.sources.readers import read_parquet_clean

    files = _files(index_dir)
    empty = pd.DataFrame({key_col: pd.Series(dtype=object),
                          "doc_id": pd.Series(dtype=np.uint64)})
    if not files:
        return empty

    def add_h2(b: pa.Table) -> pa.Table:
        keys = b[key_col].to_numpy(zero_copy_only=False)
        h2 = pd.util.hash_array(np.asarray(keys, dtype=object),
                                hash_key="psr_keymap_ln_02")
        # group on an int64 VIEW of the uint64 hash id: Ray's sort
        # shuffle materializes boundary key lists as Python ints, and
        # ids past 2^63 overflow its native int64 Arrow conversion
        # (it falls back, but logs a scary worker traceback per block);
        # any consistent total order works for grouping
        did = b["doc_id"].to_numpy().view(np.int64)
        return pa.table({"doc_id_i64": pa.array(did),
                         "h2": pa.array(h2.view(np.int64))})

    agg = read_parquet_clean(files) \
        .map_batches(add_h2, batch_format="pyarrow") \
        .groupby("doc_id_i64") \
        .aggregate(Min("h2", alias_name="h2_min"),
                   Max("h2", alias_name="h2_max"))

    def suspects(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        bad_rows = b.filter(pc.not_equal(b["h2_min"], b["h2_max"]))
        ids = bad_rows["doc_id_i64"].to_numpy().view(np.uint64)
        return pa.table({"doc_id": pa.array(ids, type=pa.uint64())})

    bad = agg.map_batches(suspects, batch_format="pyarrow").to_pandas()
    if not len(bad):
        return empty
    ids_arr = pa.array(bad["doc_id"].to_numpy())
    t = pads.dataset(files).to_table(
        filter=pads.field("doc_id").isin(ids_arr)).to_pandas()
    g = t.groupby("doc_id")[key_col].nunique()   # exact verify, tiny set
    return t[t["doc_id"].isin(g[g > 1].index)]


def urls_for(index_dir: str, doc_ids, key_col: str = "url") -> dict[int, str]:
    """doc_id → key for a small result set (pushdown read of the
    sidecar — only matching row groups are touched)."""
    files = _files(index_dir)
    if not files or not len(doc_ids):
        return {}
    ids_arr = pa.array([int(d) for d in doc_ids], type=pa.uint64())
    t = pads.dataset(files).to_table(
        filter=pads.field("doc_id").isin(ids_arr))
    return {int(d): str(k) for d, k in
            zip(t["doc_id"].to_numpy(), t[key_col].to_pylist())}


def ids_for(index_dir: str, keys, key_col: str = "url") -> dict[str, int]:
    """key → doc_id (pure recomputation — hashing is deterministic)."""
    ids = hash_keys(list(keys))
    return {str(k): int(i) for k, i in zip(keys, ids)}
