"""Parquet read helpers shared by every pipeline."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray


def read_parquet_clean(paths, columns=None, **kwargs):
    """``ray.data.read_parquet`` with schema METADATA stripped at the
    read.  pandas-written parquet (e.g. the driver's testdata tables)
    carries a ``b'pandas'`` schema-metadata blob that makes the
    resulting ``pa.Schema`` unhashable, so every downstream reduce logs
    Ray's "Failed to hash the schemas (for deduplication)" warning AND
    skips its fast schema-dedup early exit.  Passing an explicit
    metadata-free (and column-pruned) schema fixes the root cause for
    the whole downstream pipeline instead of silencing the logger —
    real schema warnings stay visible.

    Falls back to a plain ``read_parquet`` if the first file's schema
    cannot be inspected (e.g. glob patterns the driver resolves later).
    """
    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        if os.path.isdir(first):
            cands = sorted(glob.glob(os.path.join(first, "*.parquet")))
            if not cands:
                raise FileNotFoundError(first)
            first = cands[0]
        full = pq.read_schema(first)
        if columns is not None:
            schema = pa.schema([full.field(c).remove_metadata()
                                for c in columns])
        else:
            schema = full.remove_metadata()
    except Exception:
        return ray.data.read_parquet(paths, columns=columns, **kwargs)
    return ray.data.read_parquet(paths, schema=schema, columns=columns,
                                 **kwargs)
