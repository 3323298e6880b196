"""Index maintenance: latent delete + vacuum compaction.

Reference semantics (``/root/reference/src/index.rs:160-241``):
- ``remove_document`` tombstones the key and *immediately* updates the
  corpus stats (sum -= field_length; avg = sum/(N-1); N -= 1) — queries
  exclude the doc from scoring and df from that moment.
- ``vacuum`` physically drops tombstoned postings, prunes terms left
  with no postings, and clears the tombstone set.

Here: tombstones + stats are tiny JSON state; vacuum is a Ray Data
compaction job over the term shards (decode → filter → re-encode →
atomic rewrite per group).  ``first_pos`` values are preserved for
surviving terms — the reference's trie keeps node creation order across
vacuum, so expansion order must not change.
"""

from __future__ import annotations

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from probly_search_ray.functions.codec import decode_blob, encode_block
from probly_search_ray.stages.segment import SEGMENT_SCHEMA, docmeta_ipc, read_docmeta_ipc
from probly_search_ray.state.manifest import Manifest, Stats, Tombstones


def remove_document(index_dir: str, doc_id: int) -> bool:
    """Tombstone ``doc_id``.  Returns False if unknown or already removed."""
    tomb = Tombstones(index_dir)
    if doc_id in tomb.doc_ids:
        return False
    lens = _doc_field_lengths(index_dir, doc_id)
    if lens is None:
        return False
    Stats(index_dir).apply_remove(lens)
    tomb.add(doc_id)
    return True


def _doc_field_lengths(index_dir: str, doc_id: int):
    import pyarrow.dataset as pads
    meta_dir = os.path.join(index_dir, "docmeta")
    if not os.path.isdir(meta_dir):
        return None
    ds = pads.dataset(sorted(glob.glob(os.path.join(meta_dir, "*.parquet"))))
    t = ds.to_table(filter=pads.field("doc_id") == doc_id)
    if len(t) == 0:
        return None
    nf = len(t.column_names) - 1
    return [int(t[f"len_{f}"][0].as_py()) for f in range(nf)]


class _Compactor:
    """map_batches stage: drop tombstoned postings from every blob."""

    def __init__(self, tomb_sorted: np.ndarray, num_fields: int):
        self.tomb = tomb_sorted
        self.nf = num_fields

    def __call__(self, batch: pa.Table) -> pa.Table:
        terms = batch["term"].to_pylist()
        blobs = batch["blob"].to_pylist()
        keep_rows, new_blobs, new_df = [], [], []
        new_lo, new_hi = [], []
        for i, term in enumerate(terms):
            if term == "":
                mt = read_docmeta_ipc(blobs[i])
                ids = mt["doc_id"].to_numpy()
                keep = ~_in_sorted(ids, self.tomb)
                if not keep.any():
                    continue
                lens = [mt[f"len_{f}"].to_numpy()[keep] for f in range(self.nf)]
                keep_rows.append(i)
                new_blobs.append(docmeta_ipc(ids[keep], lens))
                new_df.append(int(keep.sum()))
                new_lo.append(int(ids[keep].min()))
                new_hi.append(int(ids[keep].max()))
                continue
            docs, occ, tfs, lens = decode_blob(blobs[i], self.nf)
            keep = ~_in_sorted(docs, self.tomb)
            if not keep.any():
                continue  # prune term row (src/index.rs:216-239)
            keep_rows.append(i)
            new_blobs.append(encode_block(
                docs[keep],
                [t[keep] for t in tfs], [l[keep] for l in lens]))
            new_df.append(int(occ[keep].sum()))
            new_lo.append(int(docs[keep][0]))
            new_hi.append(int(docs[keep][-1]))
        sub = batch.take(pa.array(keep_rows, type=pa.int64()))
        return pa.table({
            "term": sub["term"],
            "doc_lo": pa.array(new_lo, type=pa.uint64()),
            "doc_hi": pa.array(new_hi, type=pa.uint64()),
            "df": pa.array(new_df, type=pa.uint64()),
            "first_pos": sub["first_pos"],
            "blob": pa.array(new_blobs, type=pa.large_binary()),
        }, schema=SEGMENT_SCHEMA)


def _in_sorted(values, sorted_arr):
    if len(sorted_arr) == 0:
        return np.zeros(len(values), dtype=bool)
    idx = np.searchsorted(sorted_arr, values)
    idx = np.minimum(idx, len(sorted_arr) - 1)
    return sorted_arr[idx] == values


def vacuum(index_dir: str) -> None:
    """Compaction job (``src/index.rs:193-241``)."""
    import ray.data

    tomb = Tombstones(index_dir)
    tomb_arr = np.sort(np.asarray(tomb.doc_ids, dtype=np.uint64))
    if len(tomb_arr) == 0:
        return
    man = Manifest(index_dir)
    nf = man.data["config"]["num_fields"]
    for gid, rec in sorted(man.groups.items()):
        out_dir = os.path.join(index_dir, "terms", f"group={gid}")
        tmp_dir = out_dir + ".vacuum"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        ds = ray.data.read_parquet(sorted(
            glob.glob(os.path.join(out_dir, "*.parquet"))))
        # one vacuum pass is order-preserving per block; re-sort to keep
        # the term-sorted invariant across output files
        out = ds.map_batches(_Compactor(tomb_arr, nf),
                             batch_format="pyarrow")
        out = out.sort(["term", "doc_lo"])
        out.write_parquet(tmp_dir)
        shutil.rmtree(out_dir)
        os.replace(tmp_dir, out_dir)
        # refresh lineage: term ranges + docmeta for this group
        term_files = []
        meta_tables = []
        num_docs = 0
        sums = np.zeros(nf, dtype=np.int64)
        import pyarrow.dataset as pads
        for f in sorted(glob.glob(os.path.join(out_dir, "*.parquet"))):
            pf = pq.ParquetFile(f)
            tcol = pads.dataset(f).to_table(columns=["term"])["term"]
            tmin = tcol[0].as_py() if len(tcol) else None
            tmax = tcol[-1].as_py() if len(tcol) else None
            term_files.append({"path": os.path.relpath(f, index_dir),
                               "term_min": tmin, "term_max": tmax,
                               "rows": pf.metadata.num_rows})
            mtab = pads.dataset(f).to_table(filter=pads.field("term") == "")
            for blob in mtab["blob"].to_pylist():
                mt = read_docmeta_ipc(blob)
                meta_tables.append(mt)
                num_docs += len(mt)
                for fi in range(nf):
                    sums[fi] += int(np.sum(mt[f"len_{fi}"].to_numpy()))
        rec["term_files"] = term_files
        rec["num_docs"] = int(num_docs)
        rec["field_len_sums"] = [int(s) for s in sums]
        man.commit_group(gid, rec)
        meta_path = os.path.join(index_dir, "docmeta", f"group={gid}.parquet")
        if meta_tables:
            tmp = meta_path + ".tmp"
            pq.write_table(pa.concat_tables(meta_tables), tmp)
            os.replace(tmp, meta_path)
        elif os.path.exists(meta_path):
            os.unlink(meta_path)
    tomb.clear()
