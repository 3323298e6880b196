"""Query engine: term-range shard readers + coordinator.

Distributed query model (SURVEY.md §3.2 "Ray shape"):

- the index's terms are split into **disjoint term ranges**; each range
  is served by a ``ShardData`` (in-process for tests / small corpora,
  or inside a Ray actor pool for serving).  A term's complete posting
  list and global df live in exactly one shard (rows of the same term
  from all build groups are merged at load; df = sum of partials,
  first_pos = min of partials).
- a query runs on a coordinator: per query term it (1) gathers prefix
  expansions from the shards, (2) reconstructs the reference's
  trie-DFS expansion order from ``first_pos`` (children in reverse
  creation order, ``/root/reference/src/query.rs:130-147``),
  (3) computes BM25 ``before_each`` inputs from global stats
  (``src/score/default/bm25.rs:34-58``), (4) has shards score posting
  lists vectorized, and (5) merges with the exact
  ``max_score_merger`` semantics (``src/query.rs:150-164``): for one
  query term the doc's contribution is ``max(prev + s_first, s_rest…)``
  where ``s_first`` is the score of the doc's *first-visited* expansion
  in trie order — the reference's (quirky) behaviour, reproduced
  faithfully.

Tombstones (``src/index.rs:30-32``): a small broadcast set; postings of
removed docs are skipped and df is reduced by their occurrence counts
(``src/index.rs:281-297``), matching latent-delete semantics exactly.
"""

from __future__ import annotations

import bisect
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

from probly_search_ray.functions.tokenize import get_tokenizer
from probly_search_ray.state.manifest import Manifest, Stats, Tombstones


def _grouped_arange(lengths: np.ndarray) -> np.ndarray:
    total = int(lengths.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    starts = np.cumsum(lengths) - lengths
    return np.arange(total, dtype=np.int64) - np.repeat(starts, lengths)


def _tie_floor(kth: float) -> float:
    """One ulp below ``kth`` — the safe threshold for comparing an
    UPPER BOUND against the running kth score.  The bounds evaluate
    BM25 with a different float64 op order than the scoring kernel
    ((boost·tn)·idf vs tn·(idf·boost)), so an exact bound can land one
    ulp below an achievable real score; filtering at ``>= kth`` would
    then drop a doc that ties the kth and wins the canonical doc-id
    tie-break.  Bound and kernel each apply (at least) two independent
    roundings, so the drift can reach a few ulps — 4 ulps of slack
    covers it; the only cost is the odd extra candidate scored.  Real
    scores still compare against ``kth`` directly — they share the
    kernel's op order exactly."""
    if not np.isfinite(kth):
        return kth
    return float(kth - 4.0 * np.spacing(abs(kth)))


def _frontier_channels(F: int):
    """(support_mask, field) channels for the tight per-term bound.
    A posting's score is Σ_f w_f·tf_norm_f, and postings with DISJOINT
    field support can't be combined — yet the naive bound sums each
    field's max over ALL postings, overshooting ~2x on corpora where a
    term sits in the title of one doc and the body of another.  So for
    F ≤ 2 the frontier is computed per support CLASS (mask of fields
    with tf > 0): the bound for class m sums only f ∈ m, and the
    per-term bound is the max over classes — exact for single-field
    postings, loose only within the (rare) both-fields class.  For
    F ≥ 3 the class count would grow 2^F; mask 0 = "all postings"
    keeps the valid one-class-per-field bound."""
    if F <= 2:
        return [(m, f) for m in range(1, 1 << F)
                for f in range(F) if (m >> f) & 1]
    return [(0, f) for f in range(F)]


def _pareto_filter(tid, tf, ln, nt):
    """Per-term Pareto frontier of (tf, field_length) pairs.  tf_norm is
    increasing in tf and decreasing in length, so for ANY (k1, b, avg)
    the max posting tf_norm of a term is attained on this frontier —
    the basis of the EXACT per-term score upper bound (the loose
    tf_norm(tf_max, len_min) cross-combination overshoots the true max
    on zipf prefixes, halving what the top-k prune loop can skip).
    Frontier width per term ≤ #distinct tf values (small ints), so the
    arrays are a few % of the postings.  Zero-tf rows (field absent)
    contribute score 0 and are dropped.  Returns (off[nt+1], tf, ln)
    CSR arrays, int64/uint32/uint32."""
    if not len(tid):
        return (np.zeros(nt + 1, np.int64), np.empty(0, np.uint32),
                np.empty(0, np.uint32))
    tf64 = np.asarray(tf, np.int64)
    ln64 = np.asarray(ln, np.int64)
    order = np.lexsort((ln64, -tf64, tid))
    t_s, tf_s, ln_s = tid[order], tf64[order], ln64[order]
    # segmented running-min of length over the tf-descending order via
    # an offset trick: give earlier terms LARGER offsets so a prefix
    # min never leaks across a term boundary
    big = int(ln64.max()) + 1
    v = (np.int64(nt) - t_s) * np.int64(big) + ln_s
    runmin = np.minimum.accumulate(v)
    prev = np.empty_like(runmin)
    prev[0] = np.iinfo(np.int64).max
    prev[1:] = runmin[:-1]
    keep = (v < prev) & (tf_s > 0)
    ktid, ktf, kln = t_s[keep], tf_s[keep], ln_s[keep]
    cnt = np.bincount(ktid, minlength=nt)
    off = np.concatenate(([0], np.cumsum(cnt))).astype(np.int64)
    return off, ktf.astype(np.uint32), kln.astype(np.uint32)


def _score_ub(tfm, lmn, idf_boosts, fields_boost, avgs, k1, b):
    """Vectorized per-expansion BM25 score upper bounds: tf_norm is
    increasing in tf and decreasing in field length, so
    tf_norm(tf_max, len_min) bounds every posting per field.  Shared by
    the coordinator (multi-shard pruning) and the shard-local pushed-
    down top-k loop (``ShardData.score_bm25_topk_pruned``)."""
    s = np.zeros(len(idf_boosts), dtype=np.float64)
    for f, bb in enumerate(fields_boost):
        if bb == 0.0 or avgs[f] <= 0.0:
            continue
        tf = tfm[:, f]
        s += bb * ((k1 + 1.0) * tf) / (
            k1 * ((1.0 - b) + b * (lmn[:, f] / avgs[f])) + tf)
    return s * np.asarray(idf_boosts, dtype=np.float64)


def _levenshtein_capped(a: bytes, b: bytes, cap: int) -> int:
    """Byte-level edit distance with early exit once every cell of a
    row exceeds ``cap``.  Used only for the rare over-cap dictionary
    terms the padded fuzzy matrix excludes."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        if min(cur) > cap:
            return cap + 1
        prev = cur
    return prev[-1]


class ShardData:
    """Term dictionary + postings for one term range, merged across
    build groups.  Loaded once (actor ``__init__``), served per query.

    The on-disk varint blobs are decoded ONCE at load into flat CSR
    posting arrays (``p_docs`` / ``p_tf`` / ``p_len`` indexed by
    ``post_off`` per term): query-time posting access is a zero-copy
    numpy slice, with no per-expansion decode loop — the round-1 p95
    tail was thousands of rare prefix expansions each paying a Python
    per-block decode.  The whole load path is vectorized (one varint
    scan over the concatenated blob stream, block headers parsed in
    rounds, segmented cumsum for the doc-id deltas)."""

    def __init__(self, index_dir: str, term_lo: str | None = None,
                 term_hi: str | None = None, use_cache: bool = True,
                 doc_mod: tuple[int, int] | None = None):
        """``doc_mod=(i, D)``: DOC-sharded view — keep the FULL term
        dictionary (terms/df/first_pos/impact bounds stay the GLOBAL
        values) but restrict postings to docs with ``doc_id % D == i``.
        This is the 10^12-doc serving layout from SCALE.md: every doc's
        records live wholly in one shard, so cross-term intersection,
        accumulator merges and per-doc reductions are shard-local, and
        per-query coordinator traffic is D·k rows instead of O(df).
        Hash (mod) partitioning balances arbitrary/skewed id spaces
        with no quantile estimation.  Mutually exclusive with a term
        range; the view is derived from the full-range CSR cache (or a
        fresh decode) and never writes range-specific caches."""
        from probly_search_ray.functions.codec import FORMAT_VERSION
        from probly_search_ray.functions.mem import tune_allocator
        tune_allocator()  # shard actors are fresh processes; reuse arena
        # pages so per-query numpy temporaries don't re-fault cold pages
        if doc_mod is not None and (term_lo, term_hi) != (None, None):
            raise ValueError("doc_mod and a term range are exclusive")
        self._doc_mod = doc_mod
        man = Manifest(index_dir)
        if not man.data["config"]:
            raise FileNotFoundError(
                f"no index at {index_dir} (missing/empty manifest.json); "
                f"build one with build_index(...) or the CLI 'build' command")
        ver = man.data["config"].get("format_version")
        if ver != FORMAT_VERSION:
            raise ValueError(
                f"index at {index_dir} has format_version={ver}, engine "
                f"expects {FORMAT_VERSION}; rebuild with build_index(...)")
        self.num_fields = man.data["config"]["num_fields"]
        # mmap'd decoded-CSR cache: the first load of a (range, manifest
        # state) decodes the varint blobs and persists the flat arrays;
        # later loads np.load(mmap_mode="r") them — engine startup is
        # metadata-only and postings page in lazily per query (the
        # north star's "actor pools holding mmap'd index shards")
        self._cache_dir = None
        if use_cache:
            self._cache_dir = self._cache_path(index_dir, man,
                                               term_lo, term_hi)
            if self._load_from_cache(self._cache_dir):
                self._apply_doc_mod()
                return
            if (term_lo, term_hi) != (None, None):
                # a FULL-range cache serves any shard layout: memmap it
                # and take term-range slices (views, no copies)
                full_dir = self._cache_path(index_dir, man, None, None)
                if self._load_from_cache(full_dir,
                                         slice_range=(term_lo, term_hi)):
                    return
        tables = []
        for rec in man.term_files():
            if term_hi is not None and rec["term_min"] is not None \
                    and rec["term_min"] >= term_hi:
                continue
            if term_lo is not None and rec["term_max"] is not None \
                    and rec["term_max"] < term_lo:
                continue
            path = os.path.join(index_dir, rec["path"])
            flt = pads.field("term") != ""
            if term_lo is not None:
                flt = flt & (pads.field("term") >= term_lo)
            if term_hi is not None:
                flt = flt & (pads.field("term") < term_hi)
            t = pads.dataset(path).to_table(
                filter=flt, columns=["term", "doc_lo", "df", "first_pos",
                         "first_off", "blob"])
            if len(t):
                from probly_search_ray.stages.segment import SEGMENT_SCHEMA
                want = pa.schema([SEGMENT_SCHEMA.field(n)
                                  for n in t.column_names])
                tables.append(t.cast(want))

        F = self.num_fields
        self.terms: list[str] = []
        self.df: np.ndarray = np.empty(0, np.int64)
        self.first_pos: np.ndarray = np.empty(0, np.uint64)
        self.first_off: np.ndarray = np.empty(0, np.uint32)
        self.post_off: np.ndarray = np.zeros(1, np.int64)
        self.p_docs: np.ndarray = np.empty(0, np.uint64)
        self.p_tf: list[np.ndarray] = [np.empty(0, np.uint32)] * F
        self.p_len: list[np.ndarray] = [np.empty(0, np.uint32)] * F
        self.tf_max: list[np.ndarray] = [np.empty(0, np.uint32)] * F
        self.len_min: list[np.ndarray] = [np.empty(0, np.uint32)] * F
        self.fr = {ch: (np.zeros(1, np.int64), np.empty(0, np.uint32),
                        np.empty(0, np.uint32))
                   for ch in _frontier_channels(F)}
        if not tables:
            return
        full = pa.concat_tables(tables).sort_by(
            [("term", "ascending"), ("doc_lo", "ascending")])
        if not len(full):
            return
        self._load_csr(full, F)
        if self._cache_dir:
            # also for doc-mod views: at this point the arrays ARE the
            # full-range cache content (the view filter applies below),
            # so a cache-cold doc-sharded pool seeds the cache for every
            # later load instead of leaving D actors to re-decode
            self._write_cache(self._cache_dir)
        self._apply_doc_mod()

    # -- mmap'd decoded-CSR cache ------------------------------------------

    @staticmethod
    def _cache_path(index_dir: str, man: Manifest, term_lo, term_hi):
        import hashlib
        import json as _json
        from probly_search_ray.functions.codec import FORMAT_VERSION
        sig_src = _json.dumps([
            4,  # cache layout version (v4: v3 + first_pos doc/off split)
            FORMAT_VERSION,
            [(r["group"], r["path"], r["rows"]) for r in man.term_files()],
        ], sort_keys=True)
        sig = hashlib.md5(sig_src.encode()).hexdigest()[:12]
        rng = hashlib.md5(repr((term_lo, term_hi)).encode()).hexdigest()[:8]
        return os.path.join(index_dir, "cache", f"csr-{rng}-{sig}")

    _CACHE_ARRAYS = ("df", "first_pos", "first_off", "post_off",
                     "p_docs")

    def _write_cache(self, cdir: str) -> None:
        _write_cache_arrays(cdir, self.num_fields, self.terms, self.df,
                            self.first_pos, self.first_off,
                            self.post_off, self.p_docs,
                            self.p_tf, self.p_len, self.tf_max,
                            self.len_min, self.fr)

    def _load_from_cache(self, cdir: str, slice_range=None) -> bool:
        if not os.path.isdir(cdir):
            return False
        try:
            with open(os.path.join(cdir, "terms.bin"), "rb") as fh:
                raw = fh.read()
            lens = np.load(os.path.join(cdir, "term_lens.npy"))
            offs = np.concatenate(([0], np.cumsum(lens)))
            terms = [raw[offs[i]:offs[i + 1]].decode()
                     for i in range(len(lens))]
            for name in self._CACHE_ARRAYS:
                setattr(self, name, np.load(
                    os.path.join(cdir, name + ".npy"), mmap_mode="r"))
            self.p_tf = [np.load(os.path.join(cdir, f"p_tf_{f}.npy"),
                                 mmap_mode="r")
                         for f in range(self.num_fields)]
            self.p_len = [np.load(os.path.join(cdir, f"p_len_{f}.npy"),
                                  mmap_mode="r")
                          for f in range(self.num_fields)]
            # small (per-term) metadata arrays are hot — materialize them
            self.terms = terms
            self.df = np.array(self.df)
            self.first_pos = np.array(self.first_pos)
            self.first_off = np.array(self.first_off)
            self.tf_max = [np.load(os.path.join(cdir, f"tf_max_{f}.npy"))
                           for f in range(self.num_fields)]
            self.len_min = [np.load(os.path.join(cdir, f"len_min_{f}.npy"))
                            for f in range(self.num_fields)]
            # Pareto frontiers (v3): offsets materialize (dictionary-
            # sized, hot), points load small (≤ a few % of postings)
            self.fr = {}
            for m, f in _frontier_channels(self.num_fields):
                self.fr[(m, f)] = tuple(
                    np.load(os.path.join(cdir, f"fr_{part}_{m}_{f}.npy"))
                    for part in ("off", "tf", "len"))
            post_off = np.array(self.post_off)
            if slice_range is not None:
                lo, hi = slice_range
                i0 = bisect.bisect_left(terms, lo) if lo is not None else 0
                i1 = bisect.bisect_left(terms, hi) if hi is not None \
                    else len(terms)
                p0, p1 = int(post_off[i0]), int(post_off[i1])
                self.terms = terms[i0:i1]
                self.df = self.df[i0:i1]
                self.first_pos = self.first_pos[i0:i1]
                self.first_off = self.first_off[i0:i1]
                self.tf_max = [t[i0:i1] for t in self.tf_max]
                self.len_min = [l[i0:i1] for l in self.len_min]
                fr = {}
                for ch, (off, ftf, fln) in self.fr.items():
                    q0, q1 = int(off[i0]), int(off[i1])
                    fr[ch] = (off[i0:i1 + 1] - q0, ftf[q0:q1],
                              fln[q0:q1])
                self.fr = fr
                post_off = post_off[i0:i1 + 1] - p0
                self.p_docs = self.p_docs[p0:p1]
                self.p_tf = [t[p0:p1] for t in self.p_tf]
                self.p_len = [l[p0:p1] for l in self.p_len]
            self.post_off = post_off
            return True
        except (OSError, ValueError):
            return False

    def _apply_doc_mod(self) -> None:
        """Restrict postings to this view's hash partition of the doc
        space (``doc_id % D == i``) — one vectorized pass; dictionary
        and per-term stats keep their GLOBAL values (df/idf/bounds must
        not depend on the shard layout)."""
        if self._doc_mod is None or not len(self.p_docs):
            return
        i, D = self._doc_mod
        docs = np.asarray(self.p_docs)
        # Chunked selection: the old one-shot pass allocated ~2 full-
        # size temporaries (the % result and an (n+1) int64 cumsum) in
        # FRESH anonymous pages — on this host page-zeroing dominates
        # and made doc-shard pool start ~6x the term-sharded one.
        # Chunk-sized temporaries are REUSED from the tuned arena, and
        # the kept-index array is output-sized (n/D), so fresh pages
        # shrink to just the 1/D-sized copies this view actually keeps.
        CH = 1 << 22
        parts = []
        for a in range(0, len(docs), CH):
            sel = np.flatnonzero(
                docs[a:a + CH] % np.uint64(D) == np.uint64(i))
            parts.append((a + sel).astype(np.int64))
        idx = (np.concatenate(parts) if parts
               else np.empty(0, np.int64))
        # kept-count strictly before each term boundary == position of
        # the boundary in the sorted kept-index list
        self.post_off = np.searchsorted(
            idx, np.asarray(self.post_off)).astype(np.int64)
        self.p_docs = docs[idx]
        self.p_tf = [np.asarray(t)[idx] for t in self.p_tf]
        self.p_len = [np.asarray(li)[idx] for li in self.p_len]

    # rows per decode chunk: bounds the varint-scan temporaries (which
    # the tuned allocator then REUSES across chunks) — an unchunked scan
    # allocates ~40 bytes of fresh pages per varint value, and
    # first-touch page faults dominate this host
    _DECODE_CHUNK_ROWS = 1_000_000

    @staticmethod
    def _decode_rows(stream: np.ndarray, row_byte_start: np.ndarray, F: int):
        """Vectorized decode of a contiguous run of rows → (docs,
        tfs[F], lens[F], postings-per-row)."""
        nrows = len(row_byte_start)
        term_mask = (stream & 0x80) == 0
        v_ends = np.flatnonzero(term_mask)
        v_starts = np.empty_like(v_ends)
        if len(v_ends):
            v_starts[0] = 0
            v_starts[1:] = v_ends[:-1] + 1
        lengths = v_ends - v_starts + 1
        nvals = len(v_ends)
        vals = np.zeros(nvals, dtype=np.uint64)
        maxlen = int(lengths.max()) if nvals else 0
        for j in range(maxlen):
            sel = lengths > j
            vals[sel] |= (stream[v_starts[sel] + j].astype(np.uint64)
                          & np.uint64(0x7F)) << np.uint64(7 * j)

        # rows start at value boundaries; parse block headers in rounds
        # (#rounds = max blocks per row, small by construction)
        v_row = np.searchsorted(v_starts, row_byte_start)
        v_row_end = np.concatenate((v_row[1:], [nvals]))
        # zero-byte rows (df-0 creation-order witnesses kept by vacuum)
        # own no values — drop them before the first header round or
        # they would misread the NEXT row's block header
        alive = v_row < v_row_end
        act_v, act_row, act_end = (v_row[alive],
                                   np.arange(nrows, dtype=np.int64)[alive],
                                   v_row_end[alive])
        if not act_v.size:
            return (np.empty(0, np.uint64),
                    [np.empty(0, np.uint32)] * F,
                    [np.empty(0, np.uint32)] * F,
                    np.zeros(nrows, dtype=np.int64))
        bv_parts, bn_parts, brow_parts = [], [], []
        while act_v.size:
            n = vals[act_v].astype(np.int64)
            bv_parts.append(act_v)
            bn_parts.append(n)
            brow_parts.append(act_row)
            nxt = act_v + 1 + n * (1 + 2 * F)
            cont = nxt < act_end
            act_v, act_row, act_end = nxt[cont], act_row[cont], act_end[cont]
        bv = np.concatenate(bv_parts)
        bn = np.concatenate(bn_parts)
        brow = np.concatenate(brow_parts)
        order = np.lexsort((bv, brow))  # doc-range order within each row
        bv, bn, brow = bv[order], bn[order], brow[order]

        # doc ids: gather [first, deltas…] per block, segmented cumsum
        gidx = np.repeat(bv + 1, bn) + _grouped_arange(bn)
        raw = vals[gidx]
        cs = np.cumsum(raw)
        seg_starts = np.cumsum(bn) - bn
        base = cs[seg_starts] - raw[seg_starts]
        docs = (cs - np.repeat(base, bn)).astype(np.uint64)
        # per-field tf / len stored uint32 (exact small ints — cast to
        # float64 after the per-query gather): halves resident bytes
        ia = _grouped_arange(bn)
        sec_base = bv + 1 + bn
        tfs = [vals[np.repeat(sec_base + f * bn, bn) + ia]
               .astype(np.uint32) for f in range(F)]
        lens = [vals[np.repeat(sec_base + (F + f) * bn, bn) + ia]
                .astype(np.uint32) for f in range(F)]
        row_counts = np.bincount(brow, weights=bn, minlength=nrows) \
            .astype(np.int64)
        return docs, tfs, lens, row_counts

    def _load_csr(self, full: pa.Table, F: int) -> None:
        nrows = len(full)
        blob_col = full["blob"].combine_chunks()
        # zero-copy view of the concatenated blob bytes + per-row offsets
        off_buf = np.frombuffer(blob_col.buffers()[1], dtype=np.int64)
        off_arr = off_buf[blob_col.offset: blob_col.offset + nrows + 1]
        data = np.frombuffer(blob_col.buffers()[2], dtype=np.uint8)

        CH = self._DECODE_CHUNK_ROWS
        docs_p, rc_p = [], []
        tf_p = [[] for _ in range(F)]
        len_p = [[] for _ in range(F)]
        for i0 in range(0, nrows, CH):
            i1 = min(i0 + CH, nrows)
            stream = data[off_arr[i0]:off_arr[i1]]
            rbs = (off_arr[i0:i1] - off_arr[i0]).astype(np.int64)
            d, tfs, lens, rc = self._decode_rows(stream, rbs, F)
            docs_p.append(d)
            rc_p.append(rc)
            for f in range(F):
                tf_p[f].append(tfs[f])
                len_p[f].append(lens[f])
        self.p_docs = np.concatenate(docs_p)
        self.p_tf = [np.concatenate(x) for x in tf_p]
        self.p_len = [np.concatenate(x) for x in len_p]
        row_counts = np.concatenate(rc_p)

        # term dictionary: rows are term-sorted, so runs of equal codes
        # are term runs
        codes = full["term"].combine_chunks().dictionary_encode() \
            .indices.to_numpy().astype(np.int64)
        row_ts = np.flatnonzero(
            np.concatenate(([True], codes[1:] != codes[:-1])))
        term_col = full["term"].combine_chunks()
        self.terms = term_col.take(pa.array(row_ts)).to_pylist()
        dfs = full["df"].to_numpy().astype(np.int64)
        fps = full["first_pos"].to_numpy()
        fos = full["first_off"].to_numpy()
        self.df = np.add.reduceat(dfs, row_ts)
        # per-term first occurrence across files/batches: lexicographic
        # min of (doc, off) pairs — rows within a term run come from
        # multiple groups, so the run is not necessarily doc-ascending
        self.first_pos = np.minimum.reduceat(fps, row_ts)
        run_lens = np.diff(np.concatenate((row_ts, [len(fps)])))
        at_min = fps == np.repeat(self.first_pos, run_lens)
        fo_masked = np.where(at_min, fos, np.uint32(0xFFFFFFFF))
        self.first_off = np.minimum.reduceat(fo_masked, row_ts) \
            .astype(np.uint32)
        term_counts = np.add.reduceat(row_counts, row_ts)
        self.post_off = np.concatenate(
            ([0], np.cumsum(term_counts))).astype(np.int64)
        # With sequential doc ids, batch ranges are disjoint and the
        # doc_lo-ordered block concat is already doc-sorted per term;
        # hashed string keys overlap across batches — detect and do one
        # segmented sort so "newest-first = descending doc id" holds.
        if len(self.p_docs) > 1:
            tid = np.repeat(np.arange(len(term_counts)), term_counts)
            bad = self.p_docs[1:] < self.p_docs[:-1]
            if bad.any() and (tid[:-1][bad] == tid[1:][bad]).any():
                order = np.lexsort((self.p_docs, tid))
                self.p_docs = self.p_docs[order]
                self.p_tf = [t[order] for t in self.p_tf]
                self.p_len = [l[order] for l in self.p_len]
        self._compute_bounds()

    def _compute_bounds(self) -> None:
        """Per-term impact-bound inputs: (a) max tf and min field length
        over each term's postings — the cheap coordinator-side bound —
        and (b) the per-(term, field) Pareto frontier of (tf, len)
        pairs, which yields the EXACT max posting score for any query
        params (see ``_pareto_filter``) and drives the shard-local
        top-k prune."""
        F = self.num_fields
        seg = self.post_off[:-1]
        nt = len(self.terms)
        if nt == 0:
            self.tf_max = [np.empty(0, np.uint32)] * F
            self.len_min = [np.empty(0, np.uint32)] * F
            self.fr = {ch: (np.zeros(1, np.int64),
                            np.empty(0, np.uint32),
                            np.empty(0, np.uint32))
                       for ch in _frontier_channels(F)}
            return
        seg_n = np.diff(self.post_off)
        if (seg_n == 0).any():
            # zero-posting terms (df-0 vacuum witnesses): reduceat on a
            # zero-length segment misreads the neighbour (or walks off
            # the end), so clip the offsets and zero the results
            np_total = int(self.post_off[-1])
            segc = np.minimum(seg, max(np_total - 1, 0))
            empty = seg_n == 0
            self.tf_max = []
            self.len_min = []
            for f in range(F):
                if np_total:
                    tm = np.maximum.reduceat(self.p_tf[f], segc) \
                        .astype(np.uint32)
                    lm = np.minimum.reduceat(self.p_len[f], segc) \
                        .astype(np.uint32)
                else:
                    tm = np.zeros(nt, np.uint32)
                    lm = np.zeros(nt, np.uint32)
                tm[empty] = 0
                lm[empty] = 0
                self.tf_max.append(tm)
                self.len_min.append(lm)
        else:
            self.tf_max = [np.maximum.reduceat(self.p_tf[f], seg)
                           .astype(np.uint32) for f in range(F)]
            self.len_min = [np.minimum.reduceat(self.p_len[f], seg)
                            .astype(np.uint32) for f in range(F)]
        tid = np.repeat(np.arange(nt, dtype=np.int64), seg_n)
        support = np.zeros(len(tid), dtype=np.int64)
        for f in range(F):
            support |= (np.asarray(self.p_tf[f]) > 0).astype(np.int64) << f
        self.fr = {}
        for m, f in _frontier_channels(F):
            if m:
                sel = support == m
                self.fr[(m, f)] = _pareto_filter(
                    tid[sel], np.asarray(self.p_tf[f])[sel],
                    np.asarray(self.p_len[f])[sel], nt)
            else:
                self.fr[(m, f)] = _pareto_filter(
                    tid, np.asarray(self.p_tf[f]),
                    np.asarray(self.p_len[f]), nt)

    def frontier_ub(self, term_idx, idf_boosts, fields_boost, avgs,
                    k1: float, b: float) -> np.ndarray:
        """TIGHT per-term BM25 score upper bounds: per support class,
        the per-field max posting tf_norm over the precomputed (tf, len)
        Pareto frontier (every frontier point IS a real posting), summed
        within the class and maxed across classes — exact for postings
        whose support is a single field (see ``_frontier_channels``).
        Absent terms (idx < 0) bound to 0.  Used by the shard-local
        top-k prune loop; the coordinator keeps the cheap two-scalar
        bound for its cross-shard RPCs."""
        ti = np.asarray(term_idx, np.int64)
        present = ti >= 0
        ic = np.where(present, ti, 0)
        if not len(self.terms):
            # empty shard: off[ic + 1] below would index past the
            # single-element offsets array even with present all-False
            return np.zeros(len(ti), dtype=np.float64)
        per_mask: dict[int, np.ndarray] = {}
        for (m, f), (off, ftf, fln) in self.fr.items():
            bb = fields_boost[f]
            if bb == 0.0 or avgs[f] <= 0.0:
                continue
            lo = off[ic]
            n_f = np.where(present, off[ic + 1] - lo, 0)
            g = np.repeat(lo, n_f) + _grouped_arange(n_f)
            if not len(g):
                continue
            tf = np.asarray(ftf)[g].astype(np.float64)
            ln = np.asarray(fln)[g].astype(np.float64)
            tn = ((k1 + 1.0) * tf) / (
                k1 * ((1.0 - b) + b * (ln / avgs[f])) + tf)
            st = np.cumsum(n_f) - n_f
            nz = n_f > 0
            val = np.zeros(len(ti))
            val[nz] = np.maximum.reduceat(tn, st[nz])
            acc = per_mask.setdefault(m, np.zeros(len(ti)))
            acc += bb * val
        out = np.zeros(len(ti), np.float64)
        for v in per_mask.values():
            np.maximum(out, v, out=out)
        return out * np.asarray(idf_boosts, dtype=np.float64)

    def prefault(self, warm_arena: bool = True,
                 arena_cap: int = 64 << 20) -> int:
        """Serving-replica warmup: (1) touch every page of the mmap'd
        posting arrays so gathers never pay lazy page-in; (2) pre-fault
        an allocator arena sized to a worst-case QUERY's temporaries
        (~56 B/posting over the query's expanded df sum — NOT the whole
        shard: query working sets are bounded by their terms' postings,
        and this host zeroes anonymous pages at ~30 MB/s, so the old
        whole-shard arena alone cost a measured 52 s on a 1.6 GB shard
        while the mmap touch took 0.04 s).  The 64 MB default covers a
        ~1.2M-posting query; a rare larger expansion faults its excess
        once and the pages then stay in the arena (``tune_allocator``'s
        high trim threshold).  Returns bytes touched."""
        total = 0
        fr_arrays = [a for tup in self.fr.values() for a in tup[1:]]
        for arr in [self.p_docs, *self.p_tf, *self.p_len, *fr_arrays]:
            if len(arr):
                # one touch per 4 KiB page faults the whole mapping
                np.add.reduce(arr[:: max(1, 4096 // arr.itemsize)])
            total += arr.nbytes
        if warm_arena and len(self.p_docs):
            want = min(int(len(self.p_docs)) * 56, arena_cap)
            # sub-threshold chunks so they come from (and return to) the
            # arena, not one-shot mmaps the allocator gives back
            chunks = []
            left = want
            while left > 0:
                n = min(left, 256 << 20)
                chunks.append(np.ones(n // 8, dtype=np.float64))
                left -= n
            total += want
            del chunks
        return total

    def _fp(self, i: int) -> int:
        """Reference insertion-stream position of term i's first
        occurrence, as an arbitrary-precision Python int — exact for
        full-range uint64 doc ids (a packed uint64 would wrap)."""
        from probly_search_ray.stages.segment import POS_BITS
        return (int(self.first_pos[i]) << POS_BITS) | int(self.first_off[i])

    # -- dictionary --------------------------------------------------------

    def expand(self, prefix: str) -> list[tuple[str, int, int]]:
        """All stored terms with this prefix → (term, raw_df, first_pos).
        Enumerating them mirrors the reference's trie DFS collection
        (``src/query.rs:108-126``); order is canonicalized later."""
        i = bisect.bisect_left(self.terms, prefix)
        out = []
        while i < len(self.terms) and self.terms[i].startswith(prefix):
            out.append((self.terms[i], int(self.df[i]), self._fp(i)))
            i += 1
        return out

    def expand_with_bounds(self, prefix: str):
        """``expand`` fused with the per-expansion impact bounds — one
        RPC instead of two for the top-k query path (expansions with
        a shared prefix are contiguous in the sorted dictionary, so
        the bounds are plain array slices)."""
        i0 = bisect.bisect_left(self.terms, prefix)
        i1 = i0
        while i1 < len(self.terms) and self.terms[i1].startswith(prefix):
            i1 += 1
        exp = [(self.terms[i], int(self.df[i]), self._fp(i))
               for i in range(i0, i1)]
        F = self.num_fields
        if i1 == i0:
            z = np.zeros((0, F), dtype=np.float64)
            return exp, z, z.copy()
        tfm = np.stack([self.tf_max[f][i0:i1] for f in range(F)],
                       axis=1).astype(np.float64)
        lmn = np.stack([self.len_min[f][i0:i1] for f in range(F)],
                       axis=1).astype(np.float64)
        return exp, tfm, lmn

    # padded-matrix width cap: one pathological kilobyte-long dictionary
    # term must not inflate the whole vocab's padding (10M terms × 1KB
    # = 10GB).  Terms longer than the cap (vanishingly rare in real
    # text) take a per-term DP in the tail scan instead.
    _FUZZY_WIDTH_CAP = 48

    def _dict_matrix(self):
        """Lazily-built padded byte matrix of the dictionary (UTF-8),
        shared by every fuzzy expansion on this shard.  One-time O(vocab)
        setup (like the ``terms`` list itself), then every query is pure
        vectorized numpy.  Memory is bounded at vocab × _FUZZY_WIDTH_CAP
        bytes; over-cap terms live in a separate (tiny) index list."""
        dm = getattr(self, "_dmat", None)
        if dm is None:
            cap = self._FUZZY_WIDTH_CAP
            enc = [t.encode() for t in self.terms]
            all_lens = np.fromiter((len(e) for e in enc), np.int64,
                                   count=len(enc))
            short = np.flatnonzero(all_lens <= cap)
            long_idx = np.flatnonzero(all_lens > cap)
            lens = all_lens[short]
            width = int(lens.max()) if len(short) else 0
            mat = np.zeros((len(short), width), dtype=np.uint8)
            if len(short):
                kept = [enc[i] for i in short]
                flat = np.frombuffer(b"".join(kept), dtype=np.uint8)
                rows = np.repeat(np.arange(len(short)), lens)
                cols = _grouped_arange(lens)
                mat[rows, cols] = flat
            dm = self._dmat = (mat, lens, short, long_idx)
        return dm

    def expand_fuzzy(self, term: str, d: int) -> list[tuple[str, int, int]]:
        """Dictionary terms within byte-level Levenshtein distance ≤ d
        of ``term`` → (term, raw_df, first_pos).  An EXTENSION beyond
        the reference (its trie only supports prefix expansion,
        ``src/query.rs:108-126``); distance is over UTF-8 bytes (≡
        characters for ASCII terms).  Vectorized banded-free DP: the
        row loop runs len(term)+width times, each step an O(vocab)
        numpy kernel — no Python loop over dictionary terms."""
        q = np.frombuffer(term.encode(), dtype=np.uint8)
        mat, lens, short, long_idx = self._dict_matrix()
        # over-cap dictionary terms: candidates only when the length
        # window allows (|len - len(q)| <= d) — a handful at most
        tail_hits = []
        if len(long_idx):
            qb = term.encode()
            for i in long_idx:
                t = self.terms[i]
                if abs(len(t.encode()) - len(qb)) <= d \
                        and _levenshtein_capped(qb, t.encode(), d) <= d:
                    tail_hits.append((t, int(self.df[i]),
                                      self._fp(i)))
        cand = np.flatnonzero(np.abs(lens - len(q)) <= d)
        if not len(cand):
            return tail_hits
        sub = mat[cand]
        sl = lens[cand]
        n, width = sub.shape
        # classic DP over (query chars) x (candidate positions), the
        # candidate axis fully vectorized; early-exit rows whose running
        # minimum already exceeds d
        prev = np.broadcast_to(np.arange(width + 1, dtype=np.int32),
                               (n, width + 1)).copy()
        alive = np.arange(n)
        for i in range(1, len(q) + 1):
            cur = np.empty_like(prev)
            cur[:, 0] = i
            cost = (sub != q[i - 1]).astype(np.int32)
            for j in range(1, width + 1):
                np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1,
                           out=cur[:, j])
                np.minimum(cur[:, j], prev[:, j - 1] + cost[:, j - 1],
                           out=cur[:, j])
            keep = cur.min(axis=1) <= d
            if not keep.all():
                alive = alive[keep]
                if not len(alive):
                    # over-cap terms were matched by the tail scan and
                    # are independent of the in-matrix DP — keep them
                    return tail_hits
                cur = cur[keep]
                sub = sub[keep]
            prev = cur
        dist = prev[np.arange(len(alive)), sl[alive]]
        hit = alive[dist <= d]
        out = [(self.terms[short[i]], int(self.df[short[i]]),
                self._fp(int(short[i])))
               for i in cand[hit]]
        return out + tail_hits

    def _term_index(self, term: str) -> int:
        i = bisect.bisect_left(self.terms, term)
        if i >= len(self.terms) or self.terms[i] != term:
            return -1
        return i

    def _postings(self, term: str):
        i = self._term_index(term)
        if i < 0:
            return None
        lo, hi = self.post_off[i], self.post_off[i + 1]
        tfs = [t[lo:hi].astype(np.float64) for t in self.p_tf]
        occ = np.zeros(hi - lo, dtype=np.float64)
        for t in tfs:
            occ += t
        return (self.p_docs[lo:hi], occ, tfs,
                [l[lo:hi].astype(np.float64) for l in self.p_len])

    def df_adjusted(self, term: str, tomb: np.ndarray) -> int:
        """Occurrence-counted df excluding tombstoned docs
        (``src/index.rs:281-297``)."""
        i = self._term_index(term)
        if i < 0:
            return 0
        if len(tomb) == 0:
            return int(self.df[i])
        lo, hi = self.post_off[i], self.post_off[i + 1]
        mask = _in_sorted(self.p_docs[lo:hi], tomb)
        occ = np.zeros(int(mask.sum()), dtype=np.int64)
        for t in self.p_tf:
            occ += t[lo:hi][mask].astype(np.int64)
        return int(self.df[i] - occ.sum())

    # -- scoring -----------------------------------------------------------

    def score_bm25_batch(self, terms: list[str], idf_boosts, fields_boost,
                         avgs, k1: float, b: float, tomb: np.ndarray,
                         keep_nonpositive: bool = False,
                         topk: int | None = None,
                         floor: float = -np.inf,
                         only_docs: np.ndarray | None = None,
                         term_idx: np.ndarray | None = None):
        """Vectorized BM25 over ALL requested terms' posting lists in one
        pass (``src/score/default/bm25.rs:60-93``): gather the CSR
        slices, concatenate, score the whole concatenation with numpy —
        no per-expansion Python in the hot loop.  Returns
        ``(rank_idx, docs, scores)`` parallel arrays, where rank_idx is
        the position in ``terms``.

        ``keep_nonpositive=True`` also returns docs whose score is <= 0
        (where the reference's ``score()`` returns ``None``): the
        reference still marks those docs *visited* for the term
        (``src/query.rs:88``, insert outside the ``if let Some``), which
        changes the ``max_score_merger`` outcome for later expansions
        when ``fields_boost`` contains zeros."""
        if term_idx is not None:
            idx = term_idx
        else:
            idx = np.fromiter((self._term_index(t) for t in terms),
                              dtype=np.int64, count=len(terms))
        present = np.flatnonzero(idx >= 0)
        if not len(present):
            return (np.empty(0, np.int64), np.empty(0, np.uint64),
                    np.empty(0, np.float64))
        ti = idx[present]
        seg_lo = self.post_off[ti]
        seg_n = self.post_off[ti + 1] - seg_lo
        gidx = np.repeat(seg_lo, seg_n) + _grouped_arange(seg_n)
        ranks = np.repeat(present, seg_n)
        docs = self.p_docs[gidx]
        coef = np.repeat(np.asarray(idf_boosts, dtype=np.float64)[present],
                         seg_n)
        if only_docs is not None and len(docs):
            # TAAT suffix restriction: remaining terms can only rescore
            # docs already in the accumulator (sorted broadcast array)
            m = _in_sorted(docs, only_docs)
            gidx, ranks, docs, coef = gidx[m], ranks[m], docs[m], coef[m]
        s = np.zeros(len(docs), dtype=np.float64)
        for x in range(self.num_fields):
            tf = self.p_tf[x][gidx]
            pos = tf > 0.0
            if not pos.any():
                continue
            fl = self.p_len[x][gidx][pos]
            tfp = tf[pos]
            tf_norm = ((k1 + 1.0) * tfp) / (
                k1 * ((1.0 - b) + b * (fl / avgs[x])) + tfp)
            s[pos] += tf_norm * (coef[pos] * fields_boost[x])
        keep = None
        if len(tomb):
            keep = ~_in_sorted(docs, tomb)
        if not keep_nonpositive:
            keep = (s > 0.0) if keep is None else keep & (s > 0.0)
        if keep is not None:
            ranks, docs, s = ranks[keep], docs[keep], s[keep]
        if topk is not None and floor > -np.inf and len(docs):
            # rows below the coordinator's running kth can never enter
            # the top-k under max-merge (== floor kept for tie-break)
            m = s >= floor
            ranks, docs, s = ranks[m], docs[m], s[m]
        if topk is not None and len(docs) > topk:
            # per-doc max then per-shard top-k (ties kept): sound for the
            # single-term prune path because the global score is the max
            # over expansions, and every doc's best appearance lives in
            # exactly one shard — k docs already beat anything cut here.
            d_u, s_u = _reduce_max_by_doc(docs, s)
            if len(d_u) > topk:
                kth = -np.partition(-s_u, topk - 1)[topk - 1]
                m = s_u >= kth
                d_u, s_u = d_u[m], s_u[m]
            return np.zeros(len(d_u), np.int64), d_u, s_u
        return ranks, docs, s

    def score_bm25_topk_pruned(self, terms: list[str], idf_boosts,
                               fields_boost, avgs, k1: float, b: float,
                               tomb: np.ndarray, k: int,
                               prefix: str | None = None):
        """Single-term exact top-k with impact-bound pruning, run
        ENTIRELY shard-local — the coordinator's adaptive chunk loop
        (see ``SearchEngine._query_bm25``) pays one actor RPC round per
        chunk (64, 128, 256, ... expansions), which dominates warm
        latency for hot/prefix terms whose bounds never prune (5+
        sequential round-trips).  When term-range routing resolves the
        term's whole expansion block to ONE shard, that loop moves
        here: same bounds, same descending-upper-bound order, same
        tie-safe kth cutoff, same per-doc max-merge — byte-identical
        accumulator, one round-trip.  Returns ``(docs, scores)``.

        ``prefix``: when set (the non-fuzzy expand path), the terms are
        a permutation of the dictionary's contiguous ``[prefix, succ)``
        block, so ALL indices resolve with one range scan instead of a
        bisect per expansion (2.5k bisects ≈ 2 ms on a hot prefix)."""
        idf = np.asarray(idf_boosts, dtype=np.float64)
        if prefix is not None:
            i0 = bisect.bisect_left(self.terms, prefix)
            i1 = i0
            nt = len(self.terms)
            while i1 < nt and self.terms[i1].startswith(prefix):
                i1 += 1
            pos = {t: i for i, t in enumerate(self.terms[i0:i1],
                                              start=i0)}
            idx_all = np.fromiter((pos.get(t, -1) for t in terms),
                                  dtype=np.int64, count=len(terms))
        else:
            idx_all = np.fromiter((self._term_index(t) for t in terms),
                                  dtype=np.int64, count=len(terms))
        # Two bounds, two jobs.  ORDER by the loose tf_max/len_min
        # cross-combination (``_score_ub``): its idf dominance front-
        # loads rare SMALL-df expansions, so round 1 scores few postings
        # yet still establishes the true kth (high-idf terms produce the
        # top scores).  FILTER each chunk by the tight Pareto-frontier
        # bound (``frontier_ub``, ~2x tighter on zipf prefixes): a term
        # survives only if a REAL posting of it could reach the kth.
        # Ordering by the tight bound instead is a measured trap — it
        # promotes hot big-df terms into round 1 ('qua' on the 600k
        # bench index: 195k postings scored vs 39k loose-ordered); the
        # hybrid is never worse and cuts the worst prefix 3x ('cra'
        # 536k → 159k postings, 27 → 9 ms).
        ub_tight = self.frontier_ub(idx_all, idf, fields_boost, avgs,
                                    k1, b)
        _, tfm, lmn = self.bounds_arrays(terms, term_idx=idx_all)
        ub_loose = _score_ub(tfm, lmn, idf, fields_boost, avgs, k1, b)
        order_ub = np.argsort(-ub_loose, kind="stable")
        g_docs = np.empty(0, dtype=np.uint64)
        g_scores = np.empty(0, dtype=np.float64)
        chunk_n = 64
        pos = 0
        while pos < len(order_ub):
            if len(g_scores) >= k:
                kth = np.partition(g_scores, len(g_scores) - k)[
                    len(g_scores) - k]
            else:
                kth = -np.inf
            cand = order_ub[pos:pos + chunk_n]
            # sound break: cand is loose-desc, so every later term's
            # loose ub (>= its actual max score) is below kth too; the
            # _tie_floor threshold keeps kth TIES scoring — a tight
            # bound can EQUAL (or, by float op order, sit one ulp
            # under) a real posting score, and a doc tying the running
            # kth may still win the canonical (score desc, doc id asc)
            # tie-break
            kth_f = _tie_floor(kth)
            if ub_loose[cand[0]] < kth_f:
                break
            sel = cand[ub_tight[cand] >= kth_f]
            # an empty sel is NOT terminal: the tight filter is not the
            # ordering key, so later chunks may still qualify
            if len(sel):
                _, d, s = self.score_bm25_batch(
                    [terms[i] for i in sel], idf[sel], fields_boost,
                    avgs, k1, b, tomb, False, k, float(kth),
                    term_idx=idx_all[sel])
                if len(d):
                    g_docs, g_scores = _merge_max(
                        g_docs, g_scores, *_reduce_max_by_doc(d, s))
            pos += chunk_n
            chunk_n *= 2
        return g_docs, g_scores

    def score_bm25_reduced(self, terms: list[str], idf_boosts,
                           fields_boost, avgs, k1: float, b: float,
                           tomb: np.ndarray, only_docs=None):
        """Multi-term building block: like ``score_bm25_batch`` with
        ``keep_nonpositive=True``, but REDUCED PER DOC shard-side so the
        coordinator receives one row per touched doc instead of one per
        (expansion, posting) — the expansion multiplicity never crosses
        the wire.  Returns per-doc parallel arrays:

          docs,  r = min expansion rank visiting the doc,
          f = raw score of that first-visited record (sign matters:
              <=0 is the reference's visited-with-None case),
          p = max positive score over this shard's records,
          q = max positive score excluding the shard-first record.

        The coordinator replaces the globally-first shard's p with its
        q, so ``rest_max`` excludes exactly the one globally-first
        record (``src/query.rs:150-164``)."""
        ranks, docs, s = self.score_bm25_batch(
            terms, idf_boosts, fields_boost, avgs, k1, b, tomb,
            keep_nonpositive=True, only_docs=only_docs)
        if not len(docs):
            e = np.empty(0, np.float64)
            return (np.empty(0, np.uint64), np.empty(0, np.int64), e,
                    e.copy(), e.copy())
        order = np.lexsort((ranks, docs))
        d_s, r_s, s_s = docs[order], ranks[order], s[order]
        st = np.flatnonzero(np.concatenate(([True], d_s[1:] != d_s[:-1])))
        pos = np.where(s_s > 0.0, s_s, -np.inf)
        p_u = np.maximum.reduceat(pos, st)
        pos[st] = -np.inf
        q_u = np.maximum.reduceat(pos, st)
        return d_s[st], r_s[st], s_s[st], p_u, q_u

    def df_adjusted_many(self, terms: list[str], tomb: np.ndarray) -> list[int]:
        return [self.df_adjusted(t, tomb) for t in terms]

    def tomb_hits_many(self, terms: list[str], tomb: np.ndarray) -> np.ndarray:
        """Occurrence-counted df mass carried by THIS shard's
        tombstoned postings, per term.  A doc-sharded coordinator sums
        these across shards and subtracts from the global dictionary df
        (each doc's postings live wholly in one shard, so the sum is
        exactly the global adjustment of ``df_adjusted``)."""
        out = np.zeros(len(terms), dtype=np.int64)
        if not len(tomb):
            return out
        for j, t in enumerate(terms):
            i = self._term_index(t)
            if i < 0:
                continue
            lo, hi = self.post_off[i], self.post_off[i + 1]
            mask = _in_sorted(self.p_docs[lo:hi], tomb)
            acc = 0
            for tf in self.p_tf:
                acc += int(tf[lo:hi][mask].astype(np.int64).sum())
            out[j] = acc
        return out

    def bounds_arrays(self, terms: list[str],
                      term_idx: np.ndarray | None = None):
        """Per-term impact-bound inputs as ARRAYS: (present bool[n],
        tf_max (n,F), len_min (n,F)) — the coordinator turns these into
        BM25 score upper bounds for top-k pruning.  Absent terms carry
        zeros (present=False)."""
        if term_idx is not None:
            idx = term_idx
        else:
            idx = np.fromiter((self._term_index(t) for t in terms),
                              dtype=np.int64, count=len(terms))
        present = idx >= 0
        ic = np.maximum(idx, 0)
        F = self.num_fields
        tfm = np.zeros((len(terms), F), dtype=np.float64)
        lmn = np.zeros((len(terms), F), dtype=np.float64)
        if not len(self.terms):
            # empty shard (e.g. a vacuumed-empty term range): np.where
            # evaluates arr[ic] eagerly, so size-0 arrays need the guard
            return np.zeros(len(terms), dtype=bool), tfm, lmn
        for f in range(F):
            tfm[:, f] = np.where(present, self.tf_max[f][ic], 0)
            lmn[:, f] = np.where(present, self.len_min[f][ic], 0)
        return present, tfm, lmn

    def gather_postings_many(self, terms: list[str], tomb: np.ndarray):
        return [(i, self.gather_postings(t, tomb))
                for i, t in enumerate(terms)]

    def union_docs(self, terms: list[str], tomb: np.ndarray) -> np.ndarray:
        """Sorted-unique live doc ids appearing in ANY of ``terms``'
        postings (used by the conjunctive-query candidate build: one
        call per query term covering all its expansions; traffic is
        O(df), the term-sharded layout's floor for cross-term
        intersection — doc-sharded serving localizes it, see
        SCALE.md)."""
        parts = []
        for t in terms:
            i = self._term_index(t)
            if i >= 0:
                parts.append(self.p_docs[self.post_off[i]:
                                         self.post_off[i + 1]])
        if not parts:
            return np.empty(0, np.uint64)
        d = np.unique(np.concatenate(parts))
        if len(tomb):
            d = d[~_in_sorted(d, tomb)]
        return d

    def gather_postings(self, term: str, tomb: np.ndarray):
        """Raw (docs, tfs, lens) for scorer plugins (zero_to_one etc.)."""
        p = self._postings(term)
        if p is None:
            return None
        docs, occ, tfs, lens = p
        if len(tomb):
            keep = ~_in_sorted(docs, tomb)
            docs = docs[keep]
            tfs = [t[keep] for t in tfs]
            lens = [l[keep] for l in lens]
        return docs, tfs, lens


def _write_cache_arrays(cdir: str, num_fields: int, terms, df, first_pos,
                        first_off,
                        post_off, p_docs, p_tf, p_len, tf_max,
                        len_min, fr) -> None:
    """Persist decoded-CSR arrays as the mmap cache dir (atomic rename;
    best-effort — a read-only index dir just skips caching)."""
    import shutil
    import tempfile
    try:
        parent = os.path.dirname(cdir)
        os.makedirs(parent, exist_ok=True)
        # GC caches for the same range but stale manifest states
        prefix = os.path.basename(cdir).rsplit("-", 1)[0] + "-"
        for d in os.listdir(parent):
            if d.startswith(prefix) and os.path.join(parent, d) != cdir:
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
        tmp = tempfile.mkdtemp(dir=parent)
        for name, arr in zip(ShardData._CACHE_ARRAYS,
                             (df, first_pos, first_off, post_off,
                              p_docs)):
            np.save(os.path.join(tmp, name + ".npy"), arr)
        for f in range(num_fields):
            np.save(os.path.join(tmp, f"p_tf_{f}.npy"), p_tf[f])
            np.save(os.path.join(tmp, f"p_len_{f}.npy"), p_len[f])
            np.save(os.path.join(tmp, f"tf_max_{f}.npy"), tf_max[f])
            np.save(os.path.join(tmp, f"len_min_{f}.npy"), len_min[f])
        for (m, f), (off, ftf, fln) in fr.items():
            np.save(os.path.join(tmp, f"fr_off_{m}_{f}.npy"), off)
            np.save(os.path.join(tmp, f"fr_tf_{m}_{f}.npy"), ftf)
            np.save(os.path.join(tmp, f"fr_len_{m}_{f}.npy"), fln)
        # length-prefixed utf8 (terms may contain any byte but NUL)
        enc = [t.encode() for t in terms]
        np.save(os.path.join(tmp, "term_lens.npy"),
                np.asarray([len(e) for e in enc], dtype=np.int64))
        with open(os.path.join(tmp, "terms.bin"), "wb") as fh:
            fh.write(b"".join(enc))
        os.replace(tmp, cdir) if not os.path.exists(cdir) else \
            shutil.rmtree(tmp)
    except OSError:
        pass


def _decode_term_file(path: str, F: int):
    """Decode ONE term-sorted parquet shard file into partial CSR arrays
    (runs as a Ray task in the parallel cache build).  Returns
    dictionary-size metadata inline; the posting-size arrays stay in
    the OBJECT STORE (ref) so the driver never touches them."""
    import ray
    from probly_search_ray.functions.mem import tune_allocator
    from probly_search_ray.stages.segment import SEGMENT_SCHEMA
    tune_allocator()
    t = pads.dataset(path).to_table(
        filter=pads.field("term") != "",
        columns=["term", "doc_lo", "df", "first_pos",
                         "first_off", "blob"])
    if not len(t):
        return None
    want = pa.schema([SEGMENT_SCHEMA.field(n) for n in t.column_names])
    sd = ShardData.__new__(ShardData)
    sd.num_fields = F
    sd._load_csr(t.cast(want), F)  # file rows are (term, doc_lo)-sorted
    cnt = np.diff(sd.post_off)
    # zero-posting terms (df-0 vacuum witnesses) own no doc range
    doc_lo = np.zeros(len(cnt), np.uint64)
    doc_hi = np.zeros(len(cnt), np.uint64)
    nz = cnt > 0
    if nz.any():
        doc_lo[nz] = sd.p_docs[sd.post_off[:-1][nz]]
        doc_hi[nz] = sd.p_docs[(sd.post_off[1:] - 1)[nz]]
    big = ray.put((sd.p_docs, sd.p_tf, sd.p_len))
    # per-part Pareto frontier CANDIDATES (already computed by
    # _compute_bounds inside _load_csr): dictionary-scale, returned
    # inline; the driver re-filters the per-term union across parts
    return (sd.terms, sd.df, sd.first_pos, cnt, sd.tf_max, sd.len_min,
            doc_lo, doc_hi, big, sd.fr, sd.first_off)


def _write_cache_slices(tmp_dir: str, F: int, big, dest_starts,
                        counts):
    """Phase-2 writer task: place one part's posting arrays into the
    preallocated memmap .npy files at the destination offsets computed
    by the driver (disjoint ranges across tasks → safe parallel
    writes).  ``big`` arrives as an auto-dereferenced object-store
    ref."""
    from probly_search_ray.functions.mem import tune_allocator
    tune_allocator()
    p_docs, p_tf, p_len = big
    idx = np.repeat(dest_starts, counts) + _grouped_arange(counts)
    mm = np.load(os.path.join(tmp_dir, "p_docs.npy"), mmap_mode="r+")
    mm[idx] = p_docs
    del mm
    for f in range(F):
        mm = np.load(os.path.join(tmp_dir, f"p_tf_{f}.npy"),
                     mmap_mode="r+")
        mm[idx] = p_tf[f]
        del mm
        mm = np.load(os.path.join(tmp_dir, f"p_len_{f}.npy"),
                     mmap_mode="r+")
        mm[idx] = p_len[f]
        del mm
    return True


def build_csr_cache(index_dir: str) -> bool:
    """Build the FULL-RANGE decoded-CSR mmap cache fully in parallel —
    so the first serving engine after a fresh build starts from the
    cache instead of paying a cold single-process varint decode of the
    whole index (minutes at 10⁶+ docs).  Any shard layout slices it.

    Shape (the driver only ever touches DICTIONARY-sized data):
      phase 1 — one Ray task per term file decodes partial CSR arrays;
        posting-sized arrays stay in the object store, only per-term
        metadata returns to the driver;
      merge — the driver stable-sorts dictionary rows by (term, group)
        (groups carry ascending doc ranges for sequential ids, so
        appends keep this path) and computes each part's destination
        offsets — all vocab-sized arithmetic;
      phase 2 — writer tasks place each part's postings into
        PREALLOCATED memmap .npy files at disjoint offsets (parallel
        writes; the driver never materializes a posting array).

    Falls back to the in-process sorted ``ShardData`` load (which also
    writes the cache) for hashed string keys or overlapping per-term
    doc ranges, where postings need a global re-sort.  Returns True
    when a cache exists on exit."""
    import shutil
    import tempfile

    import ray

    man = Manifest(index_dir)
    if not man.data["config"]:
        return False
    F = man.data["config"]["num_fields"]
    cdir = ShardData._cache_path(index_dir, man, None, None)
    if os.path.isdir(cdir):
        return True
    if man.data["config"].get("string_key"):
        ShardData(index_dir)  # hashed ids interleave → needs the re-sort
        return os.path.isdir(cdir)
    recs = sorted(man.term_files(),
                  key=lambda r: (r["term_min"] or "", r["path"]))
    if not recs:
        return False
    task = ray.remote(num_cpus=1)(_decode_term_file)
    results = ray.get([task.remote(os.path.join(index_dir, r["path"]), F)
                       for r in recs])
    grank = {g: i for i, g in
             enumerate(sorted({r["group"] for r in recs}))}
    parts = [(p, grank[r["group"]])
             for p, r in zip(results, recs) if p is not None]
    if not parts:
        return False
    # --- dictionary-level merge (everything here is vocab-sized) -----
    terms = np.asarray([t for p, _ in parts for t in p[0]], dtype=object)
    nrows = len(terms)
    df = np.concatenate([p[1] for p, _ in parts])
    fp = np.concatenate([p[2] for p, _ in parts])
    fo = np.concatenate([p[10] for p, _ in parts])
    cnt = np.concatenate([p[3] for p, _ in parts])
    tfm = [np.concatenate([p[4][f] for p, _ in parts]) for f in range(F)]
    lmn = [np.concatenate([p[5][f] for p, _ in parts]) for f in range(F)]
    doc_lo = np.concatenate([p[6] for p, _ in parts])
    doc_hi = np.concatenate([p[7] for p, _ in parts])
    row_g = np.concatenate([np.full(len(p[0]), g, dtype=np.int64)
                            for p, g in parts])
    o1 = np.argsort(row_g, kind="stable")
    order = o1[np.argsort(terms[o1], kind="stable")]
    t_o = terms[order]
    lo_o, hi_o = doc_lo[order], doc_hi[order]
    if nrows > 1:
        same = t_o[1:] == t_o[:-1]
        if (same & (lo_o[1:] <= hi_o[:-1])).any():
            ShardData(index_dir)  # overlapping doc ranges: global sort
            return os.path.isdir(cdir)
    cnt_o = cnt[order]
    new = np.ones(nrows, dtype=bool)
    new[1:] = t_o[1:] != t_o[:-1]
    runs = np.flatnonzero(new)
    terms_m = [str(t) for t in t_o[runs]]
    df_m = np.add.reduceat(df[order], runs)
    fp_m = np.minimum.reduceat(fp[order], runs)
    run_l = np.diff(np.concatenate((runs, [nrows])))
    fo_o = np.where(fp[order] == np.repeat(fp_m, run_l),
                    fo[order], np.uint32(0xFFFFFFFF))
    fo_m = np.minimum.reduceat(fo_o, runs).astype(np.uint32)
    cnt_m = np.add.reduceat(cnt_o, runs)
    tfm_m = [np.maximum.reduceat(t[order], runs).astype(np.uint32)
             for t in tfm]
    lmn_m = [np.minimum.reduceat(l[order], runs).astype(np.uint32)
             for l in lmn]
    # merge per-part Pareto frontier candidates: union each merged
    # term's candidates across parts, re-filter (dictionary-scale work
    # — candidate width per term is ≤ #distinct tf values; a posting's
    # support class is a per-posting property, so per-part classes
    # union cleanly)
    n_m = len(runs)
    mrow = np.cumsum(new) - 1          # merged term id per ordered row
    fr_m = {}
    for ch in _frontier_channels(F):
        c_cnt = np.concatenate([np.diff(p[9][ch][0]) for p, _ in parts])
        c_tf = np.concatenate([p[9][ch][1] for p, _ in parts])
        c_ln = np.concatenate([p[9][ch][2] for p, _ in parts])
        starts = np.cumsum(c_cnt) - c_cnt
        oc = c_cnt[order]
        gi = np.repeat(starts[order], oc) + _grouped_arange(oc)
        ctid = np.repeat(mrow, oc)
        fr_m[ch] = _pareto_filter(ctid, c_tf[gi], c_ln[gi], n_m)
    post_off = np.concatenate(([0], np.cumsum(cnt_m))).astype(np.int64)
    total = int(post_off[-1])
    # destination offset of each source row: by construction post_off
    # follows the same (term, group) order, so it's the running count
    dest_o = np.cumsum(cnt_o) - cnt_o
    dest = np.empty(nrows, dtype=np.int64)
    dest[order] = dest_o
    # --- preallocate memmaps + phase-2 parallel slice writes ---------
    try:
        parent = os.path.join(index_dir, "cache")
        os.makedirs(parent, exist_ok=True)
        prefix = os.path.basename(cdir).rsplit("-", 1)[0] + "-"
        for d in os.listdir(parent):
            if d.startswith(prefix) and os.path.join(parent, d) != cdir:
                shutil.rmtree(os.path.join(parent, d), ignore_errors=True)
        tmp = tempfile.mkdtemp(dir=parent)
        mm = np.lib.format.open_memmap(
            os.path.join(tmp, "p_docs.npy"), mode="w+",
            dtype=np.uint64, shape=(total,))
        del mm
        for f in range(F):
            for name in (f"p_tf_{f}.npy", f"p_len_{f}.npy"):
                mm = np.lib.format.open_memmap(
                    os.path.join(tmp, name), mode="w+",
                    dtype=np.uint32, shape=(total,))
                del mm
        wtask = ray.remote(num_cpus=1)(_write_cache_slices)
        futs = []
        row0 = 0
        for p, _ in parts:
            nr = len(p[0])
            futs.append(wtask.remote(tmp, F, p[8],
                                     dest[row0:row0 + nr],
                                     cnt[row0:row0 + nr]))
            row0 += nr
        ray.get(futs)
        np.save(os.path.join(tmp, "df.npy"), df_m)
        np.save(os.path.join(tmp, "first_pos.npy"), fp_m)
        np.save(os.path.join(tmp, "first_off.npy"), fo_m)
        np.save(os.path.join(tmp, "post_off.npy"), post_off)
        for f in range(F):
            np.save(os.path.join(tmp, f"tf_max_{f}.npy"), tfm_m[f])
            np.save(os.path.join(tmp, f"len_min_{f}.npy"), lmn_m[f])
        for (m, f), (off, ktf, kln) in fr_m.items():
            np.save(os.path.join(tmp, f"fr_off_{m}_{f}.npy"), off)
            np.save(os.path.join(tmp, f"fr_tf_{m}_{f}.npy"), ktf)
            np.save(os.path.join(tmp, f"fr_len_{m}_{f}.npy"), kln)
        enc = [t.encode() for t in terms_m]
        np.save(os.path.join(tmp, "term_lens.npy"),
                np.asarray([len(e) for e in enc], dtype=np.int64))
        with open(os.path.join(tmp, "terms.bin"), "wb") as fh:
            fh.write(b"".join(enc))
        os.replace(tmp, cdir) if not os.path.exists(cdir) else \
            shutil.rmtree(tmp)
    except OSError:
        return False  # cache is best-effort (read-only dir etc.)
    return os.path.isdir(cdir)


def _reduce_max_by_doc(d, s):
    """(docs, scores) → (sorted-unique docs, per-doc MAX score).  The
    one per-doc reduction shape shared by the shard-local top-k cut,
    both prune loops and ``_merge_max`` — the stable sort + run-starts
    + ``maximum.reduceat`` tie subtleties live here once."""
    if not len(d):
        return d, s
    o = np.argsort(d, kind="stable")
    d_s, s_s = d[o], s[o]
    st = np.flatnonzero(np.concatenate(([True], d_s[1:] != d_s[:-1])))
    return d_s[st], np.maximum.reduceat(s_s, st)


def _merge_max(d1, s1, d2, s2):
    """Merge two (sorted docs, scores) maps taking the per-doc max."""
    if not len(d1):
        return d2, s2
    return _reduce_max_by_doc(np.concatenate((d1, d2)),
                              np.concatenate((s1, s2)))


class _SizeOnlyDict(dict):
    """Stand-in for the reference's ``docs`` map in ``before_each`` —
    calculators only use ``len(docs)`` (= N); the actual doc-meta is
    denormalized into the postings."""

    def __init__(self, n: int):
        super().__init__()
        self._n = n

    def __len__(self):
        return self._n


def _in_sorted(values: np.ndarray, sorted_arr: np.ndarray) -> np.ndarray:
    """Membership of values in a sorted array (vectorized anti-join)."""
    idx = np.searchsorted(sorted_arr, values)
    idx = np.minimum(idx, len(sorted_arr) - 1)
    return sorted_arr[idx] == values


def trie_expansion_order(expansions: list[tuple[str, int, int]],
                         prefix: str) -> list[str]:
    """Order expansion terms exactly as the reference trie DFS would
    (``/root/reference/src/query.rs:130-147``): emit the prefix term
    first if present, then children in reverse creation order (newest
    first), where a child subtree's creation position is the minimum
    ``first_pos`` of its terms.  Ties (possible only past the 2^20
    per-doc position cap) break by char ascending, deterministically."""
    out: list[str] = []

    def rec(p: str, items: list[tuple[str, int]]):
        # items: (term, first_pos) all having prefix p, sorted by term
        rest = []
        for t, fp in items:
            if t == p:
                out.append(t)
            else:
                rest.append((t, fp))
        groups: dict[str, list] = {}
        for t, fp in rest:
            groups.setdefault(t[len(p)], []).append((t, fp))
        ordered = sorted(
            groups.items(),
            key=lambda kv: (-min(fp for _, fp in kv[1]), kv[0]))
        for ch, sub in ordered:
            rec(p + ch, sub)

    rec(prefix, sorted((t, fp) for t, _, fp in expansions))
    return out


class SearchEngine:
    """User-facing query API over a built index (the reference's
    ``Index::query``, ``/root/reference/src/query.rs:21-106``)."""

    def __init__(self, index_dir: str, num_shards: int = 1,
                 use_actors: bool = False, shard_handles=None,
                 prefault: bool = False, doc_shards: int = 0,
                 shard_ranges=None):
        """``shard_handles``: pre-created ``ShardData`` actor handles to
        SHARE across engines (e.g. many bulk-search coordinators over
        one resident shard pool) instead of loading the index again.
        ``prefault=True`` touches every posting page at startup (a
        serving replica's warmup) so queries never pay lazy mmap
        page-in; default off keeps engine start metadata-only.

        ``doc_shards=D``: DOC-sharded serving (SCALE.md "what would
        change first beyond one node") — D shards each hold the full
        term dictionary but only the postings of docs with
        ``doc_id % D == i``.  All of a doc's records are shard-local,
        so per-doc reductions, the TAAT accumulator and conjunctive
        intersection never cross shards, and stopword-scale merges
        shrink from O(df) coordinator rows to D·k.  Results are
        bit-identical to the default layout (df/idf/stats stay global).
        Mutually exclusive with ``num_shards > 1``."""
        if doc_shards and num_shards > 1:
            raise ValueError("doc_shards and num_shards>1 are exclusive")
        self._shared_ranges = shard_ranges
        self.index_dir = index_dir
        self.num_shards = num_shards
        self.doc_shards = int(doc_shards)
        self.use_actors = use_actors or shard_handles is not None
        self._shared_handles = shard_handles
        self._prefault = prefault
        self._load()

    def _load(self):
        man = Manifest(self.index_dir)
        cfg = man.data["config"]
        if not cfg:
            raise FileNotFoundError(
                f"no index at {self.index_dir} (missing/empty manifest.json); "
                f"build one with build_index(...) or the CLI 'build' command")
        self.num_fields = cfg["num_fields"]
        self.tokenizer = get_tokenizer(cfg["tokenizer"])
        self.stats = Stats(self.index_dir)
        self._reload_tombstones()
        self._manifest_sig = self._sig(man)
        if self._shared_handles is not None:
            import ray
            self.shards = list(self._shared_handles)
            self._ray = ray
            # shared pools may pass their term ranges along for routing
            # (unknown → conservative full fan-out)
            self._ranges = getattr(self, "_shared_ranges", None)
            return
        if self.doc_shards:
            D = self.doc_shards
            kwargs = [dict(doc_mod=(i, D)) for i in range(D)]
            self._ranges = None
        else:
            bounds = self._shard_bounds(man, self.num_shards)
            kwargs = [dict(term_lo=lo, term_hi=hi) for lo, hi in bounds]
            # per-shard term ranges → per-term RPC routing (a unigram
            # query touches ONE shard, not the whole pool)
            self._ranges = bounds
        # On a doc-sharded pool a query's temporaries split ~1/D per
        # shard (every shard scores only its own docs), so each actor's
        # arena shrinks accordingly — pool-wide warm cost stays ~one
        # query working set, not D of them.
        arena_cap = max(16 << 20, (64 << 20) // max(self.doc_shards, 1))
        if self.use_actors:
            import ray
            # size CPU requests so the whole pool always schedules, even
            # when shards outnumber available CPUs (else: deadlock)
            avail = ray.cluster_resources().get("CPU", len(kwargs))
            cpus = max(0.1, min(1.0, (avail - 1) / max(len(kwargs), 1)))
            Actor = ray.remote(num_cpus=cpus)(ShardData)
            self.shards = [Actor.remote(self.index_dir, **kw)
                           for kw in kwargs]
            self._ray = ray
            if self._prefault:
                ray.get([s.prefault.remote(arena_cap=arena_cap)
                         for s in self.shards])
        else:
            self.shards = [ShardData(self.index_dir, **kw) for kw in kwargs]
            if self._prefault:
                for s in self.shards:
                    s.prefault(arena_cap=arena_cap)

    @staticmethod
    def _sig(man: Manifest):
        return [(gid, rec.get("vacuum_gen", 0), len(rec["term_files"]))
                for gid, rec in sorted(man.groups.items())]

    def refresh(self) -> bool:
        """Pick up index changes made since load — appended groups
        (incremental ``build_index``), vacuum swaps, removals.  The
        analogue of the reference's shared-``Mutex<Index>`` concurrent
        add+query (``tests/integrations_tests.rs:151-168``): an engine
        serves a consistent snapshot, and ``refresh()`` moves it to the
        latest committed state.  Returns True if shards were reloaded
        (manifest changed); tombstones/stats reload is always applied
        (cheap)."""
        man = Manifest(self.index_dir)
        if self._sig(man) != self._manifest_sig:
            if self._shared_handles is not None:
                # the actors belong to another engine/pool; reloading
                # only this coordinator's stats would mix NEW idf
                # inputs with the actors' OLD postings — refuse loudly
                raise RuntimeError(
                    "index changed under an engine with shared shard "
                    "handles; rebuild the owning pool (the handles) "
                    "instead — this engine cannot reload actors it "
                    "does not own")
            self._load()
            return True
        self.stats = Stats(self.index_dir)
        self._reload_tombstones()
        return False

    def _reload_tombstones(self):
        tids = Tombstones(self.index_dir).doc_ids
        self.tomb = np.sort(np.asarray(tids, dtype=np.uint64))
        # expansion cache is df-dependent; only valid with no tombstones
        self._exp_cache: dict[tuple, tuple] = {}

    def _shard_bounds(self, man: Manifest, num_shards: int):
        if num_shards <= 1:
            return [(None, None)]
        mins = sorted(r["term_min"] for r in man.term_files()
                      if r["term_min"] is not None and r["term_min"] != "")
        if not mins:
            return [(None, None)]
        qs = [mins[int(len(mins) * i / num_shards)] for i in range(1, num_shards)]
        qs = sorted(set(qs))
        bounds = []
        lo = None
        for q in qs:
            bounds.append((lo, q))
            lo = q
        bounds.append((lo, None))
        return bounds

    # -- shard fan-out helpers --------------------------------------------

    def _call(self, method: str, *args):
        return self._call_shards(self.shards, method, *args)

    def _call_shards(self, shards, method: str, *args):
        if self.use_actors:
            refs = [getattr(s, method).remote(*args) for s in shards]
            return self._ray.get(refs)
        return [getattr(s, method)(*args) for s in shards]

    def _route(self, term: str):
        """Shards whose term range can contain ``term`` or any term
        prefixed by it.  In a term-sharded pool every per-term call
        routes here: a unigram query touches ONE shard instead of
        broadcasting to the pool (the shape a multi-node deployment
        needs — per-query RPC fan-out is O(terms), not O(shards)).
        Doc-sharded / unknown-range pools fall back to full fan-out
        (routed-away shards would only ever contribute empties, so
        routing is a pure traffic optimization, never a semantics
        change)."""
        ranges = getattr(self, "_ranges", None)
        if ranges is None or len(self.shards) == 1 or not term:
            return self.shards
        last = term[-1]
        if ord(last) >= 0x10FFFF:          # unsuccessorable: stay safe
            return self.shards
        hi_t = term[:-1] + chr(ord(last) + 1)   # prefix-range upper bound
        out = [s for (lo, hi), s in zip(ranges, self.shards)
               if (hi is None or term < hi) and (lo is None or lo < hi_t)]
        return out or [self.shards[0]]

    def _call_term(self, term: str, method: str, *args):
        """Fan a per-term call out to only the shards that can own it."""
        return self._call_shards(self._route(term), method, *args)

    def _term_call(self, term: str, fuzzy: int, method: str, *args):
        """Per-term fan-out honoring fuzzy expansion: fuzzy variants can
        start with any byte, so term-range routing doesn't apply — every
        shard's dictionary slice may own a match."""
        if fuzzy:
            return self._call(method, *args)
        return self._call_term(term, method, *args)

    def _call_one(self, shard, method: str, *args):
        if self.use_actors:
            return self._ray.get(getattr(shard, method).remote(*args))
        return getattr(shard, method)(*args)

    # -- string keys (reference generic T, src/index.rs:35) ----------------

    def keys_for(self, results) -> list[tuple[str, float]]:
        """Map [(doc_id, score)] back to [(key, score)] for a
        string-keyed index (keymap sidecar, pushdown read of just the
        result ids)."""
        from probly_search_ray.state.keymap import urls_for
        man = Manifest(self.index_dir)
        key_col = man.data["config"].get("orig_key_col", "url")
        m = urls_for(self.index_dir, [d for d, _ in results], key_col)
        return [(m.get(int(d), str(d)), s) for d, s in results]

    # -- query -------------------------------------------------------------

    def query(self, q: str, scorer: str = "bm25", k: int | None = None,
              fields_boost: list[float] | None = None, expand: bool = True,
              k1: float = 1.2, b: float = 0.75,
              require_all: bool = False,
              fuzzy: int = 0,
              exclude: str | None = None) -> list[tuple[int, float]]:
        """Free-text disjunctive query; returns [(doc_id, score)] in
        canonical (score desc, doc_id asc) order, optionally top-k.
        ``expand=False`` disables prefix expansion (exact-term mode, an
        extension over the reference used for SQL-checkable oracles).
        ``require_all=True`` switches to conjunctive (AND) semantics —
        only docs matching EVERY query term (any expansion counts) are
        returned, scored identically to the disjunctive path (an
        extension; the reference is OR-only).
        ``exclude="..."`` (an extension; the reference is OR-only)
        drops every doc matching ANY exclude term (same tokenizer and
        expansion mode as the query) from the result — the NOT side of
        a boolean query.  Exclusion is applied BEFORE top-k selection
        (shard-side top-k pruning is disabled for the query, since a
        pruned candidate set could let excluded docs displace
        legitimate ones), so `k` results are exactly the best k
        surviving docs.
        ``fuzzy=d`` (d > 0, bm25 only) replaces prefix expansion with
        Levenshtein-distance-≤-d dictionary expansion: each query term
        expands to every stored term within edit distance d, scored
        like a prefix expansion (idf · boost, per-doc max merge) with
        boost = 1 for the exact term else
        ln(1 + 1/(1 + |bytes(e)| − |bytes(term)| as abs)) — the
        reference's byte-length-delta boost shape applied to the
        absolute length difference (an extension; the reference trie
        is prefix-only)."""
        fields_boost = fields_boost or [1.0] * self.num_fields
        if fuzzy and scorer != "bm25":
            raise ValueError("fuzzy expansion is bm25-only")
        query_terms = self.tokenizer.py_fn(q)
        qlen = len(query_terms)  # includes empty tokens (src/query.rs:32)
        n_docs = self.stats.num_docs
        avgs = [self.stats.field_avg(f) for f in range(self.num_fields)]

        restrict = None
        if require_all:
            restrict = self._conjunctive_candidates(query_terms, expand,
                                                    fuzzy)
            if restrict is not None and not len(restrict):
                return []
        excl = None
        if exclude:
            excl = self._excluded_docs(self.tokenizer.py_fn(exclude),
                                       expand, fuzzy)

        if scorer == "bm25":
            docs, scores = self._query_bm25(query_terms, fields_boost,
                                            n_docs, avgs, k1, b, expand,
                                            None if (excl is not None
                                                     and len(excl)) else k,
                                            restrict_docs=restrict,
                                            fuzzy=fuzzy)
            if excl is not None and len(docs):
                keep = ~_in_sorted(docs, excl) if len(excl) else \
                    np.ones(len(docs), bool)
                docs, scores = docs[keep], scores[keep]
            # canonical (score desc, doc_id asc) + top-k in numpy — no
            # Python materialization of the full result set
            if k is not None and len(docs) > k:
                kth = -np.partition(-scores, k - 1)[k - 1]
                keep = scores >= kth  # tie-safe candidate cut
                docs, scores = docs[keep], scores[keep]
            order = np.lexsort((docs, -scores))
            if k is not None:
                order = order[:k]
            return [(int(d), float(s))
                    for d, s in zip(docs[order], scores[order])]
        elif scorer == "zero_to_one":
            res = self._query_zero_to_one(query_terms, qlen, expand)
        elif hasattr(scorer, "score"):  # custom calculator (U3)
            res = self._query_custom(scorer, query_terms, qlen, fields_boost,
                                     avgs, n_docs, expand)
        else:
            raise ValueError(f"unknown scorer {scorer!r}")
        if restrict is not None:
            keep = set(int(d) for d in restrict)
            res = [r for r in res if int(r[0]) in keep]
        if excl is not None and len(excl):
            drop = set(int(d) for d in excl)
            res = [r for r in res if int(r[0]) not in drop]
        res.sort(key=lambda r: (-r[1], r[0]))
        return res[:k] if k is not None else res

    def complete(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Query autocomplete (an extension; the reference trie walks
        prefixes but exposes no completion API): the stored dictionary
        terms with this prefix ranked by (tombstone-adjusted df desc,
        term asc), top-k.  Term-sharded pools route to only the shards
        whose range can hold the prefix; the per-shard range scan is
        the same one prefix expansion uses."""
        ordered, df_map = self._expansions_for(prefix, expand=True)
        ranked = sorted(((t, d) for t, d in df_map.items() if d > 0),
                        key=lambda x: (-x[1], x[0]))
        return [(t, int(d)) for t, d in ranked[:k]]

    def _excluded_docs(self, excl_terms, expand, fuzzy=0) -> np.ndarray:
        """Sorted-unique doc ids matching ANY exclude term (a doc
        matches a term if it appears in any of its expansions'
        postings) — the NOT side of a boolean query.  Same shape as the
        conjunctive fan-out: one ``union_docs`` call per term (O(df)
        ids per shard), union folded on the coordinator."""
        parts = []
        seen = set()
        for term in excl_terms:
            if term == "" or term in seen:
                continue
            seen.add(term)
            ordered, _ = self._expansions_for(term, expand, fuzzy)
            if not ordered:
                continue
            parts.extend(d for d in self._term_call(
                term, fuzzy, "union_docs", ordered, self.tomb) if len(d))
        return np.unique(np.concatenate(parts)) if parts else \
            np.empty(0, np.uint64)

    def _conjunctive_candidates(self, query_terms, expand, fuzzy=0):
        """Doc ids matching EVERY distinct non-empty query term (a doc
        matches a term if it appears in any of its expansions'
        postings).  One ``union_docs`` fan-out per term (O(df) ids per
        shard), intersections folded on the coordinator; the result is
        O(min df) and restricts all later scoring."""
        cand = None
        seen = set()
        for term in query_terms:
            if term == "" or term in seen:
                continue
            seen.add(term)
            ordered, _ = self._expansions_for(term, expand, fuzzy)
            if not ordered:
                return np.empty(0, np.uint64)
            parts = [d for d in self._term_call(term, fuzzy, "union_docs",
                                                ordered, self.tomb)
                     if len(d)]
            docs = np.unique(np.concatenate(parts)) if parts else \
                np.empty(0, np.uint64)
            cand = docs if cand is None else \
                np.intersect1d(cand, docs, assume_unique=True)
            if cand is not None and not len(cand):
                return cand
        return cand

    # .. BM25 ..............................................................

    def _prefetch_expansions(self, query_terms, expand: bool) -> None:
        """Actor-pool RTT eliminator: for every uncached query term,
        fire ONE fused ``expand_with_bounds`` RPC per routed shard —
        all terms' requests in flight CONCURRENTLY — and populate both
        the expansion cache and the bounds cache from the responses.
        A k-term top-k query then costs k parallel metadata RPCs + the
        scoring rounds, instead of 2k sequential rounds.  No-ops
        in-process (no RTT to save), under tombstones (df needs the
        adjusted fan-out), and for doc-sharded pools (shard 0 already
        answers everything there)."""
        if not self.use_actors or len(self.tomb):
            return
        todo, seen = [], set()
        for t in query_terms:
            if t and t not in seen \
                    and (t, expand, 0) not in self._exp_cache:
                seen.add(t)
                todo.append(t)
        if not todo:
            return
        if self.doc_shards:
            # doc shards share one global dictionary: shard 0 answers
            # all metadata — fire every term's fused RPC concurrently
            self._prefetch_doc_sharded(todo, expand)
            return
        if not expand:
            # exact-term mode: the adjusted-df probes, all in flight
            in_flight = [(t, [s.df_adjusted.remote(t, self.tomb)
                              for s in self._route(t)]) for t in todo]
            for t, refs in in_flight:
                d = max(self._ray.get(refs), default=0)
                entry = ([t], {t: int(d)}) if d > 0 else ([], {})
                if len(self._exp_cache) < 65536:
                    self._exp_cache[(t, False, 0)] = entry
            return
        in_flight = [(t, [s.expand_with_bounds.remote(t)
                          for s in self._route(t)]) for t in todo]
        for t, refs in in_flight:
            res = self._ray.get(refs)
            all_exp = [e for (lst, _, _) in res for e in lst]
            if not all_exp:
                entry = ([], {})
            else:
                ordered = trie_expansion_order(all_exp, t)
                df_map = {e: raw for e, raw, _ in all_exp}
                ordered = [e for e in ordered if df_map.get(e, 0) > 0]
                entry = (ordered, df_map)
                F = self.num_fields
                tfm = np.zeros((len(ordered), F), dtype=np.float64)
                lmn = np.zeros((len(ordered), F), dtype=np.float64)
                pos = {e: i for i, e in enumerate(ordered)}
                for (lst, t_s, l_s) in res:
                    for j, (e, _, _) in enumerate(lst):
                        i = pos.get(e)
                        if i is not None:
                            tfm[i] = t_s[j]
                            lmn[i] = l_s[j]
                if len(self._exp_cache) < 65536:
                    self._exp_cache[("__bounds__", t, True, 0)] = (tfm, lmn)
            if len(self._exp_cache) < 65536:
                self._exp_cache[(t, True, 0)] = entry

    def _prefetch_doc_sharded(self, todo, expand: bool) -> None:
        s0 = self.shards[0]
        if not expand:
            refs = [(t, s0.df_adjusted.remote(t, np.empty(0, np.uint64)))
                    for t in todo]
            for t, r in refs:
                d = int(self._ray.get(r))
                entry = ([t], {t: d}) if d > 0 else ([], {})
                if len(self._exp_cache) < 65536:
                    self._exp_cache[(t, False, 0)] = entry
            return
        refs = [(t, s0.expand_with_bounds.remote(t)) for t in todo]
        for t, r in refs:
            all_exp, t_s, l_s = self._ray.get(r)
            if not all_exp:
                entry = ([], {})
            else:
                ordered = trie_expansion_order(all_exp, t)
                df_map = {e: raw for e, raw, _ in all_exp}
                ordered = [e for e in ordered if df_map.get(e, 0) > 0]
                entry = (ordered, df_map)
                F = self.num_fields
                tfm = np.zeros((len(ordered), F), dtype=np.float64)
                lmn = np.zeros((len(ordered), F), dtype=np.float64)
                pos = {e: i for i, e in enumerate(ordered)}
                for j, (e, _, _) in enumerate(all_exp):
                    i = pos.get(e)
                    if i is not None:
                        tfm[i] = t_s[j]
                        lmn[i] = l_s[j]
                if len(self._exp_cache) < 65536:
                    self._exp_cache[("__bounds__", t, True, 0)] = (tfm, lmn)
            if len(self._exp_cache) < 65536:
                self._exp_cache[(t, True, 0)] = entry

    def _expansions_for(self, term: str, expand: bool, fuzzy: int = 0):
        """Global expansion list in reference trie order, with
        tombstone-adjusted df; terms with df == 0 are skipped
        (``src/query.rs:44-48``) but still shape the order.

        Results are memoized per engine instance while no tombstones
        exist (the dictionary is immutable between refreshes): repeated
        hot prefixes skip the expand fan-out and the Python trie-order
        reconstruction, which dominate warm-query time for
        expansion-heavy prefixes."""
        key = (term, expand, fuzzy)
        if not len(self.tomb) and key in self._exp_cache:
            return self._exp_cache[key]
        if fuzzy:
            res = self._expansions_for_fuzzy(term, fuzzy)
        else:
            res = self._expansions_for_uncached(term, expand)
        if not len(self.tomb) and len(self._exp_cache) < 65536:
            self._exp_cache[key] = res
        return res

    def _expansions_for_fuzzy(self, term: str, d: int):
        """Fuzzy (Levenshtein ≤ d) expansion list: deterministic order =
        the exact term first (if stored), then the variants sorted
        lexicographically.  The dictionary scan fans out to EVERY shard
        (variants don't share the term's prefix range); doc-sharded
        pools ask shard 0's full dictionary once."""
        if self.doc_shards:
            all_exp = self._call_one(self.shards[0], "expand_fuzzy",
                                     term, d)
        else:
            per_shard = self._call("expand_fuzzy", term, d)
            all_exp = [e for lst in per_shard for e in lst]
        if not all_exp:
            return [], {}
        ordered = sorted(t for t, _, _ in all_exp if t != term)
        if any(t == term for t, _, _ in all_exp):
            ordered.insert(0, term)
        if self.doc_shards:
            df_map = {t: raw for t, raw, _ in all_exp}
            if len(self.tomb):
                terms_list = list(df_map)
                hits = self._call("tomb_hits_many", terms_list, self.tomb)
                total = np.sum(np.stack(hits), axis=0)
                df_map = {t: int(df_map[t] - h)
                          for t, h in zip(terms_list, total)}
        elif len(self.tomb):
            terms_list = [t for t, _, _ in all_exp]
            per_shard = self._call("df_adjusted_many", terms_list,
                                   self.tomb)
            df_map = {}
            for lst in per_shard:
                for t, dd in zip(terms_list, lst):
                    if dd > 0:
                        df_map[t] = dd  # a term lives in one shard
        else:
            df_map = {t: raw for t, raw, _ in all_exp}
        df_map = {t: dd for t, dd in df_map.items() if dd > 0}
        ordered = [t for t in ordered if t in df_map]
        return ordered, df_map

    def _expansions_for_uncached(self, term: str, expand: bool):
        if self.doc_shards:
            return self._expansions_for_doc_sharded(term, expand)
        per_shard = self._call_term(term, "expand", term) if expand else None
        if expand:
            all_exp = [e for lst in per_shard for e in lst]
        else:
            all_exp = []
            for shard in self._route(term):
                d = self._call_one(shard, "df_adjusted", term, self.tomb)
                if d > 0:
                    all_exp.append((term, d, 0))
        if not all_exp:
            return [], {}
        ordered = trie_expansion_order(all_exp, term) if expand \
            else [t for t, _, _ in all_exp]
        # adjusted df (only needs decode when tombstones exist)
        df_map = {}
        if len(self.tomb):
            terms_list = [t for t, _, _ in all_exp]
            per_shard = self._call_term(term, "df_adjusted_many",
                                        terms_list, self.tomb)
            for lst in per_shard:
                for t, d in zip(terms_list, lst):
                    if d > 0:
                        df_map[t] = d
        else:
            for t, raw_df, _ in all_exp:
                df_map[t] = raw_df
        ordered = [t for t in ordered if df_map.get(t, 0) > 0]
        return ordered, df_map

    def _expansions_for_doc_sharded(self, term: str, expand: bool):
        """Doc-sharded metadata path: every shard holds the FULL
        dictionary with global raw df, so expansions come from ONE
        shard (no fan-out, no dedup); under tombstones the adjusted df
        is ``raw_df - Σ_shards local tombstone hits`` (each doc's
        postings are shard-local, so the sum is exact)."""
        if expand:
            all_exp = self._call_one(self.shards[0], "expand", term)
        else:
            d = self._call_one(self.shards[0], "df_adjusted", term,
                               np.empty(0, np.uint64))
            all_exp = [(term, int(d), 0)] if d > 0 else []
        if not all_exp:
            return [], {}
        ordered = trie_expansion_order(all_exp, term) if expand \
            else [t for t, _, _ in all_exp]
        df_map = {t: raw for t, raw, _ in all_exp}
        if len(self.tomb):
            terms_list = [t for t, _, _ in all_exp]
            hits = self._call("tomb_hits_many", terms_list, self.tomb)
            total = np.sum(np.stack(hits), axis=0)
            df_map = {t: int(df_map[t] - h)
                      for t, h in zip(terms_list, total)}
        df_map = {t: d for t, d in df_map.items() if d > 0}
        ordered = [t for t in ordered if t in df_map]
        return ordered, df_map

    def _bounds_for(self, term: str, expand: bool, ordered: list[str],
                    fuzzy: int = 0):
        """Impact-bound matrices (tf_max, len_min — each (n, F) float64,
        aligned to ``ordered``) for top-k pruning; fetched LAZILY (only
        bm25 top-k queries pay the extra shard round-trip) and memoized
        with the expansion cache.  A term lives in exactly one shard;
        absent shards contribute zeros."""
        key = ("__bounds__", term, expand, fuzzy)
        if not len(self.tomb) and key in self._exp_cache:
            return self._exp_cache[key]
        if self.doc_shards:
            # doc shards keep the GLOBAL per-term bounds — one shard
            # answers for all
            per_shard = [self._call_one(self.shards[0], "bounds_arrays",
                                        ordered)]
        else:
            per_shard = self._term_call(term, fuzzy, "bounds_arrays",
                                        ordered)
        tfm = np.zeros((len(ordered), self.num_fields), dtype=np.float64)
        lmn = np.zeros((len(ordered), self.num_fields), dtype=np.float64)
        for present, t_s, l_s in per_shard:
            m = present
            tfm[m] = t_s[m]
            lmn[m] = l_s[m]
        res = (tfm, lmn)
        if not len(self.tomb) and len(self._exp_cache) < 65536:
            self._exp_cache[key] = res
        return res

    @staticmethod
    def _score_ub_vec(tfm, lmn, idf_boosts, fields_boost, avgs, k1, b):
        """See module-level ``_score_ub`` (kept as a method alias)."""
        return _score_ub(tfm, lmn, idf_boosts, fields_boost, avgs, k1, b)

    def _query_bm25(self, query_terms, fields_boost, n_docs, avgs, k1, b,
                    expand, k=None, restrict_docs=None, fuzzy=0):
        if not fuzzy:
            self._prefetch_expansions(query_terms, expand)
        term_infos = []
        for term in query_terms:
            if term == "":
                continue
            ordered, df_map = self._expansions_for(term, expand, fuzzy)
            if not ordered:
                continue
            # vectorized idf × byte-length expansion boost (bit-identical
            # to the scalar formulas: same float64 op order, np.log is
            # the same libm log as math.log) — the scalar loop was ~3 ms
            # per hot prefix term (2.5k expansions × log+encode+min)
            n = len(ordered)
            dfs = np.fromiter((df_map[e] for e in ordered),
                              dtype=np.float64, count=n)
            freq = np.minimum(float(n_docs), dfs)
            idf = np.log(1.0 + (n_docs - freq + 0.5) / (freq + 0.5))
            tb = len(term.encode())
            bl = np.fromiter((len(e.encode()) for e in ordered),
                             dtype=np.float64, count=n)
            boost = np.log(1.0 + 1.0 / (1.0 + np.abs(bl - tb)))
            exact = np.fromiter((e == term for e in ordered),
                                dtype=bool, count=n)
            boost[exact] = 1.0
            term_infos.append((term, ordered, idf * boost))
        # Exact top-k pruning is valid only when ONE query term
        # contributes postings: the merge is then a pure per-doc max
        # over expansions (prev is always None, so expansion order
        # cannot affect scores).
        prune = k is not None and len(term_infos) == 1
        # short multi-term queries: dispatch every term's reduced-
        # scoring RPC CONCURRENTLY — the sequential per-term round-trips
        # dominate warm latency, while the TAAT suffix restriction they
        # enable (a shard-traffic optimization that never changes
        # scores: docs outside the accumulator provably cannot enter
        # the top-k, so scoring them anyway is rank-identical) rarely
        # fires this early — measured 1 restricted call in 240 over
        # 4-6-term queries on the 600k bench index.  The merge below
        # still consumes results in term order, so the ranking is
        # byte-identical.  7+-term queries keep the sequential loop:
        # the restriction's traffic savings compound with term count
        # and the remaining-UB sum shrinks as terms are consumed.
        concurrent_refs = None
        if self.use_actors and 2 <= len(term_infos) <= 6:
            concurrent_refs = []
            for term, ordered, idf_boosts in term_infos:
                shards = self.shards if fuzzy else self._route(term)
                concurrent_refs.append(
                    [s.score_bm25_reduced.remote(
                        ordered, idf_boosts, fields_boost, avgs, k1, b,
                        self.tomb, restrict_docs) for s in shards])
        # per-term score upper bounds for the multi-term TAAT suffix
        # restriction (bounds fetched lazily — only top-k queries pay)
        term_ubs = None
        if k is not None and len(term_infos) > 1 and concurrent_refs is None:
            term_ubs = []
            for term, ordered, idf_boosts in term_infos:
                tfm, lmn = self._bounds_for(term, expand, ordered, fuzzy)
                term_ubs.append(float(self._score_ub_vec(
                    tfm, lmn, idf_boosts, fields_boost, avgs, k1, b).max()))
        g_docs = np.empty(0, dtype=np.uint64)
        g_scores = np.empty(0, dtype=np.float64)
        # conjunctive restriction (if any) applies from the first term;
        # the TAAT suffix restriction below can only tighten it further
        only_docs = restrict_docs
        for ti, (term, ordered, idf_boosts) in enumerate(term_infos):
            if prune:
                routed = self.shards if fuzzy else self._route(term)
                pfx = term if expand and not fuzzy else None
                if len(routed) == 1:
                    # the whole expansion block lives on one shard: run
                    # the identical prune loop THERE — one RPC round
                    # instead of one per adaptive chunk (the dominant
                    # warm-latency cost for hot/prefix single-term
                    # queries whose bounds never prune)
                    g_docs, g_scores = self._call_one(
                        routed[0], "score_bm25_topk_pruned", ordered,
                        idf_boosts, fields_boost, avgs, k1, b,
                        self.tomb, k, pfx)
                    break
                if self.doc_shards:
                    # doc-sharded pool: every doc's postings live on
                    # exactly ONE shard, so each shard's LOCAL pruned
                    # top-k (ties kept) provably contains every
                    # globally-top-k doc it owns — run the loop on all
                    # shards in ONE concurrent round and union, instead
                    # of fanning each adaptive chunk to the whole pool
                    if self.use_actors:
                        parts = self._ray.get(
                            [s.score_bm25_topk_pruned.remote(
                                ordered, idf_boosts, fields_boost, avgs,
                                k1, b, self.tomb, k, pfx)
                             for s in self.shards])
                    else:
                        parts = [s.score_bm25_topk_pruned(
                            ordered, idf_boosts, fields_boost, avgs,
                            k1, b, self.tomb, k, pfx)
                            for s in self.shards]
                    d_all = np.concatenate([p[0] for p in parts])
                    s_all = np.concatenate([p[1] for p in parts])
                    o = np.argsort(d_all, kind="stable")
                    g_docs, g_scores = d_all[o], s_all[o]
                    break
                # process expansions in descending score upper bound;
                # stop when the bound can no longer enter the top-k
                tfm, lmn = self._bounds_for(term, expand, ordered, fuzzy)
                ub_each = self._score_ub_vec(tfm, lmn, idf_boosts,
                                             fields_boost, avgs, k1, b)
                order_ub = np.argsort(-ub_each, kind="stable")
                # chunks double each round: tight early cutoff when hot
                # terms can be pruned, few RPC rounds when they can't
                CHUNK = 64
                pos = 0
                while pos < len(order_ub):
                    if len(g_scores) >= k:
                        kth = np.partition(g_scores, len(g_scores) - k)[
                            len(g_scores) - k]
                    else:
                        kth = -np.inf
                    cand = order_ub[pos:pos + CHUNK]
                    # >= with the ulp-safe floor, mirroring the
                    # shard-local loop: a bound equaling the kth may be
                    # a real score whose doc wins the doc-id tie-break
                    chunk = cand[
                        ub_each[cand] >= _tie_floor(kth)].tolist()
                    if not chunk:
                        break
                    terms_c = [ordered[i] for i in chunk]
                    coefs_c = [idf_boosts[i] for i in chunk]
                    per_shard = self._term_call(
                        term, fuzzy,
                        "score_bm25_batch", terms_c, coefs_c, fields_boost,
                        avgs, k1, b, self.tomb, False, k, float(kth))
                    dp = [d for _, d, _ in per_shard if len(d)]
                    sp = [s for _, _, s in per_shard if len(s)]
                    if dp:
                        d_u, s_u = _reduce_max_by_doc(
                            np.concatenate(dp), np.concatenate(sp))
                        g_docs, g_scores = _merge_max(g_docs, g_scores,
                                                     d_u, s_u)
                    pos += CHUNK
                    CHUNK *= 2
                break
            if term_ubs is not None and only_docs is None \
                    and ti > 0 and len(g_scores) >= k:
                # docs outside the accumulator can gain at most the sum
                # of the remaining terms' bounds; strictly below the
                # running kth they can neither enter nor tie the top-k,
                # so the remaining terms only rescore accumulator docs
                kth = np.partition(g_scores, len(g_scores) - k)[
                    len(g_scores) - k]
                if sum(term_ubs[ti:]) < kth:
                    only_docs = g_docs.copy()
            # ONE per-doc-REDUCED call per shard for all expansions of
            # this term: shards locally fold their (expansion, posting)
            # records into per-doc (min rank, first score, max positive,
            # max positive excl. shard-first) rows, so coordinator
            # traffic and merge work scale with #docs touched, never
            # with expansion multiplicity.  Docs whose score would be
            # None in the reference are still *visited* (src/query.rs:88)
            # — f carries the raw first-record score, sign and all.
            if concurrent_refs is not None:
                per_shard = self._ray.get(concurrent_refs[ti])
            else:
                per_shard = self._term_call(
                    term, fuzzy, "score_bm25_reduced", ordered,
                    idf_boosts, fields_boost, avgs, k1, b, self.tomb,
                    only_docs)
            per_shard = [t for t in per_shard if len(t[0])]
            if not per_shard:
                continue
            d_all = np.concatenate([t[0] for t in per_shard])
            r_all = np.concatenate([t[1] for t in per_shard])
            f_all = np.concatenate([t[2] for t in per_shard])
            p_all = np.concatenate([t[3] for t in per_shard])
            q_all = np.concatenate([t[4] for t in per_shard])
            order = np.lexsort((r_all, d_all))
            d_s, f_s = d_all[order], f_all[order]
            p_s, q_s = p_all[order], q_all[order]
            starts = np.flatnonzero(
                np.concatenate(([True], d_s[1:] != d_s[:-1])))
            term_docs = d_s[starts]
            s_first = f_s[starts]
            sf_pos = s_first > 0.0
            # rest_max over *positive* scores only (None-scores never
            # merge); the globally-first shard row contributes q (its
            # max excluding the one globally-first record), others p
            val = p_s
            val[starts] = q_s[starts]
            rest_max = np.maximum.reduceat(val, starts)
            # merge into global scores (max_score_merger semantics):
            #   prev exists, s_first>0 → max(prev + s_first, rest…)
            #   prev exists, s_first<=0 → max(prev, rest…)   (visited-only)
            #   no prev               → max(s_first if >0, rest…)
            idx = np.searchsorted(g_docs, term_docs)
            has_prev = np.zeros(len(term_docs), dtype=bool)
            prev = np.zeros(len(term_docs), dtype=np.float64)
            if len(g_docs):
                idx_c = np.minimum(idx, len(g_docs) - 1)
                has_prev = g_docs[idx_c] == term_docs
                prev = np.where(has_prev, g_scores[idx_c], 0.0)
            base = np.where(
                has_prev,
                np.where(sf_pos, prev + s_first, prev),
                np.where(sf_pos, s_first, -np.inf))
            new_vals = np.maximum(base, rest_max)
            # docs with no positive score this term and no prior entry
            # never enter the scores map
            valid = new_vals > -np.inf
            term_docs = term_docs[valid]
            new_vals = new_vals[valid]
            # build merged arrays
            keep_mask = np.ones(len(g_docs), dtype=bool)
            if len(g_docs) and len(term_docs):
                keep_mask = ~_in_sorted(g_docs, term_docs)
            md = np.concatenate((g_docs[keep_mask], term_docs))
            ms = np.concatenate((g_scores[keep_mask], new_vals))
            o = np.argsort(md, kind="stable")
            g_docs, g_scores = md[o], ms[o]
        return g_docs, g_scores

    # .. custom ScoreCalculator (U3 hook, src/score/calculator.rs:33-70) ....

    def _query_custom(self, calc, query_terms, qlen, fields_boost, avgs,
                      n_docs, expand):
        """Generic path for user ScoreCalculator implementations
        (``probly_search_ray.refmodel.ScoreCalculator`` contract).

        Faithful to the reference visit order: expansions in trie order,
        postings newest-first (descending doc id), ``score()`` invoked
        once per *occurrence* — so stateful calculators observe exactly
        what the reference's posting-list walk would produce.
        """
        from probly_search_ray.refmodel import FieldDetails, TermData, ZeroToOne
        self._prefetch_expansions(query_terms, expand)
        fields = []
        for f in range(self.num_fields):
            fd = FieldDetails()
            fd.sum = self.stats.field_sum(f)
            fd.avg = self.stats.field_avg(f)
            fields.append(fd)
        docs_proxy = _SizeOnlyDict(n_docs)
        scores: dict[int, float] = {}
        node_uid: dict[str, int] = {}
        is_z2o = isinstance(calc, ZeroToOne)
        for qti, term in enumerate(query_terms):
            if term == "":
                continue
            ordered, df_map = self._expansions_for(term, expand)
            visited: set[int] = set()
            per_shard = self._call_term(term, "gather_postings_many",
                                        ordered, self.tomb)
            by_rank: dict[int, list] = {}
            for lst in per_shard:
                for i, p in lst:
                    if p is not None:
                        by_rank.setdefault(i, []).append(p)
            for rank in sorted(by_rank):
                parts = by_rank[rank]
                if len(parts) == 1:
                    by_rank[rank] = parts[0]
                else:
                    # doc-sharded: shards return doc-disjoint slices of
                    # the same posting list — restore ascending-doc
                    # order so the newest-first walk below is faithful
                    d_all = np.concatenate([p[0] for p in parts])
                    o = np.argsort(d_all, kind="stable")
                    by_rank[rank] = (
                        d_all[o],
                        [np.concatenate([p[1][x] for p in parts])[o]
                         for x in range(self.num_fields)],
                        [np.concatenate([p[2][x] for p in parts])[o]
                         for x in range(self.num_fields)])
                e = ordered[rank]
                uid = node_uid.setdefault(e, len(node_uid))
                td = TermData(qti, qlen, term, e)
                pre = calc.before_each(td, df_map[e], docs_proxy)
                docs, tfs, lens = by_rank[rank]
                # newest-first = descending doc id (postings prepended,
                # src/index.rs:422-433); one score() call per occurrence
                for di in range(len(docs) - 1, -1, -1):
                    key = int(docs[di])
                    tf = [int(t[di]) for t in tfs]
                    fl = [int(l[di]) for l in lens]
                    n_vis = int(sum(tf))
                    for _ in range(max(n_vis, 1)):
                        if is_z2o:
                            calc._current_key = key
                        s = calc.score(pre, tf, fl, uid, fields_boost,
                                       fields, td)
                        if s is not None:
                            prev = scores.get(key)
                            if prev is None:
                                new = s
                            elif key in visited:
                                new = max(prev, s)
                            else:
                                new = prev + s
                            scores[key] = new
                        visited.add(key)
        results = [[k, v] for k, v in scores.items()]
        calc.finalize(results)
        return [(k, v) for k, v in results]

    # .. zero_to_one ........................................................

    def _query_zero_to_one(self, query_terms, qlen, expand):
        """Vectorized record gathering + per-(doc,field) pool consumption
        (``src/score/default/zero_to_one.rs:84-126``).

        Record order within a (doc, field) group must equal the
        reference's stable sort: score desc, ties in insertion order =
        (query term index asc, trie-expansion rank asc) — encoded here
        as a global sequence number per (qti, expansion) batch."""
        self._prefetch_expansions(query_terms, expand)
        node_uid: dict[str, int] = {}
        a_doc, a_field, a_score, a_qti, a_uid, a_tf, a_flen, a_seq = \
            [], [], [], [], [], [], [], []
        cand_parts = []
        seq = 0
        for qti, term in enumerate(query_terms):
            if term == "":
                continue
            ordered, df_map = self._expansions_for(term, expand)
            tl = float(len(term.encode()))
            per_shard = self._call_term(term, "gather_postings_many",
                                        ordered, self.tomb)
            flat = [(i, p) for lst in per_shard for i, p in lst if p is not None]
            flat.sort(key=lambda x: x[0])  # expansion rank order
            for i, p in flat:
                e = ordered[i]
                uid = node_uid.setdefault(e, len(node_uid))
                te = float(len(e.encode()))
                e_score = 1.0 - abs(te - tl) / te
                docs, tfs, lens = p
                cand_parts.append(docs)
                for x in range(self.num_fields):
                    tf = tfs[x]
                    m = tf > 0
                    if not m.any():
                        continue
                    n = int(m.sum())
                    a_doc.append(docs[m])
                    a_field.append(np.full(n, x, np.int32))
                    a_score.append(np.full(n, e_score, np.float64))
                    a_qti.append(np.full(n, qti, np.int32))
                    a_uid.append(np.full(n, uid, np.int64))
                    a_tf.append(tf[m])
                    a_flen.append(lens[x][m])
                    a_seq.append(np.full(n, seq, np.int64))
                seq += 1
        if not cand_parts:
            return []
        candidates = np.unique(np.concatenate(cand_parts))
        if not a_doc:
            return [(int(d), 0.0) for d in candidates]
        doc = np.concatenate(a_doc)
        fld = np.concatenate(a_field)
        sc = np.concatenate(a_score)
        qti_a = np.concatenate(a_qti)
        uid_a = np.concatenate(a_uid)
        tf_a = np.concatenate(a_tf).astype(np.int64)
        fl_a = np.concatenate(a_flen).astype(np.int64)
        seq_a = np.concatenate(a_seq)
        order = np.lexsort((seq_a, -sc, fld, doc))
        doc, fld, sc = doc[order], fld[order], sc[order]
        qti_a, uid_a, tf_a, fl_a = (qti_a[order], uid_a[order],
                                    tf_a[order], fl_a[order])
        # group boundaries per (doc, field); records within a group are
        # already in the reference walk order (score desc, seq asc)
        newgrp = np.concatenate(
            ([True], (doc[1:] != doc[:-1]) | (fld[1:] != fld[:-1])))
        starts = np.flatnonzero(newgrp)
        ends = np.concatenate((starts[1:], [len(doc)]))
        n = len(doc)
        gid = (np.cumsum(newgrp) - 1).astype(np.int64)
        ngroups = len(starts)
        # Vectorized pool walk.  The greedy walk consumes the FIRST
        # record of each (group, qti) in walk order — UNLESS the node
        # pool is exhausted when that record arrives, which can only
        # happen if the ignore-pool selection would consume more records
        # of one (group, node) than its tf.  So: select ignoring the
        # pool, then detect violating groups and replay only those with
        # the exact per-record loop (rare: needs the same expansion term
        # under enough distinct query terms to out-count its tf).
        o2 = np.lexsort((np.arange(n, dtype=np.int64), qti_a, gid))
        g2, q2 = gid[o2], qti_a[o2]
        first = np.ones(n, dtype=bool)
        first[1:] = (g2[1:] != g2[:-1]) | (q2[1:] != q2[:-1])
        consumed = np.zeros(n, dtype=bool)
        consumed[o2[first]] = True
        ci = np.flatnonzero(consumed)
        o3 = np.lexsort((ci, uid_a[ci], gid[ci]))
        gc_, uc_, tfc = gid[ci][o3], uid_a[ci][o3], tf_a[ci][o3]
        newrun = np.ones(len(ci), dtype=bool)
        newrun[1:] = (gc_[1:] != gc_[:-1]) | (uc_[1:] != uc_[:-1])
        runs = np.flatnonzero(newrun)
        runlen = np.diff(np.append(runs, len(ci)))
        bad_groups = np.unique(gc_[runs[runlen > tfc[runs]]])
        good = consumed
        if len(bad_groups):
            good = consumed & ~np.isin(gid, bad_groups)
        tf_f = tf_a.astype(np.float64)
        contrib = np.minimum(sc / tf_f, 1.0) * tf_f \
            / np.maximum(fl_a, qlen).astype(np.float64)
        # bincount returns int64 for EMPTY weighted input — cast, or the
        # replay assignments below silently truncate to integers
        acc = np.bincount(gid[good], weights=contrib[good],
                          minlength=ngroups).astype(np.float64)
        for g in bad_groups:  # exact replay of the reference walk
            pool: dict[int, int] = {}
            consumed_q: set[int] = set()
            accv = 0.0
            for i in range(starts[g], ends[g]):
                q = int(qti_a[i])
                if q in consumed_q:
                    continue
                nid = int(uid_a[i])
                if nid in pool:
                    if pool[nid] <= 0:
                        continue
                    pool[nid] -= 1
                else:
                    pool[nid] = int(tf_a[i]) - 1
                consumed_q.add(q)
                accv += min(sc[i] / tf_a[i], 1.0) * tf_a[i] / float(
                    max(fl_a[i], qlen))
            acc[g] = accv
        # doc score = max over its (doc, field) pools
        d0 = doc[starts]
        o = np.argsort(d0, kind="stable")
        d_s, v_s = d0[o], acc[o]
        st2 = np.flatnonzero(np.concatenate(([True], d_s[1:] != d_s[:-1])))
        dmax = np.maximum.reduceat(v_s, st2)
        scores = dict(zip((int(x) for x in d_s[st2]),
                          (float(x) for x in dmax)))
        return [(int(d), scores.get(int(d), 0.0)) for d in candidates]
