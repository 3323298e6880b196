"""Curation-tranche unit tests: planted contamination, pack_shards
block-layout invariance, deterministic sampling, repetition kernel."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from probly_search_ray.stages import curation


def _docs_ds(rows, num_blocks=1):
    return ray.data.from_pandas(pd.DataFrame(rows)) \
        .repartition(num_blocks)


@pytest.mark.usefixtures("ray_session")
def test_decontaminate_planted():
    shared = "alpha beta gamma delta epsilon"          # one 5-gram
    rows = [
        {"doc_id": 0, "text": f"prefix {shared} suffix"},      # benchmark
        {"doc_id": 30, "text": f"noise {shared} more noise"},  # contaminated
        {"doc_id": 31, "text": "totally different words here now ok"},
    ]
    out = curation.decontaminate(_docs_ds(rows), bench_mod=29).to_pandas() \
        .set_index("doc_id")
    assert 0 not in out.index                  # benchmark docs excluded
    assert out.loc[30, "contaminated"] == 1
    assert out.loc[30, "n_overlap"] == 1       # exactly the shared 5-gram
    assert out.loc[31, "contaminated"] == 0


@pytest.mark.usefixtures("ray_session")
def test_pack_shards_block_layout_invariant():
    rng = np.random.default_rng(7)
    rows = [{"doc_id": i, "text": " ".join(["w"] * int(rng.integers(1, 40)))}
            for i in range(200)]
    a = curation.pack_shards(_docs_ds(rows, 1), budget=100).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = curation.pack_shards(_docs_ds(rows, 7), budget=100).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)
    # contract: shard = floor(tokens-before / budget), in doc_id order
    cum_prev = a["n_tokens"].cumsum().shift(fill_value=0)
    assert (a["shard_id"] == cum_prev // 100).all()
    assert a["shard_id"].is_monotonic_increasing


def test_sample_mask_deterministic_and_stratified():
    ids = np.arange(100_000, dtype=np.int64)
    m1 = curation.sample_mask(ids)
    m2 = curation.sample_mask(ids)
    assert (m1 == m2).all()
    rate = m1.mean()
    assert 0.05 < rate < 0.15                   # ~1/10 residue class


def test_repetition_kernel_brute_force():
    texts = ["a a a b c", "x y", "q", "m n m n m n m n"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts)})
    # run the per-batch kernel directly
    import ray.data as rd
    out = curation.repetition_stats(rd.from_arrow(t)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    def brute(s):
        toks = [x for x in s.split(" ") if x]
        n = len(toks)
        bigs = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        tt = max((toks.count(x) for x in set(toks)), default=0) / max(n, 1)
        tb = max((bigs.count(x) for x in set(bigs)), default=0) / max(n - 1, 1)
        return round(tt, 6), round(tb, 6)
    for i, s in enumerate(texts):
        tt, tb = brute(s)
        assert out.loc[i, "top_token_frac"] == pytest.approx(tt)
        assert out.loc[i, "top_bigram_frac"] == pytest.approx(tb)


@pytest.mark.usefixtures("ray_session")
def test_asof_join_planted():
    """Distributed as-of join vs a brute-force reference on a random
    corpus with PLANTED timestamp ties (same key, same right ts →
    deterministic max-tie winner) and keyless left rows (dropped)."""
    from probly_search_ray.stages.joins import asof_join
    rng = np.random.default_rng(17)
    nl, nr = 300, 200
    lk = rng.integers(0, 20, nl)
    lts = rng.integers(1000, 2000, nl)
    rk = rng.integers(0, 25, nr)          # keys 20..24 never match left
    rts = rng.integers(900, 2100, nr)
    rts[:40] = np.repeat(rts[:8], 5)      # planted ties
    rk[:40] = np.repeat(rk[:8], 5)
    left = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64), "user_id": lk,
        "ts": pd.to_datetime(lts, unit="s")})
    right = pd.DataFrame({
        "o_orderkey": np.arange(nr, dtype=np.int64), "o_custkey": rk,
        "o_orderdate": pd.to_datetime(rts, unit="s"),
        "o_totalprice": rng.random(nr).round(6)})
    got = asof_join(
        ray.data.from_pandas(left).repartition(5),
        ray.data.from_pandas(right).repartition(4),
        left_key="user_id", left_ts="ts", right_key="o_custkey",
        right_ts="o_orderdate", left_cols=["event_id"],
        right_cols=["o_orderkey", "o_totalprice"],
        right_tie="o_orderkey", num_buckets=7) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)

    # brute force: per left row, max (ts, tie) among matching rights
    want = []
    for i in range(nl):
        m = (rk == lk[i]) & (rts <= lts[i])
        if not m.any():
            continue
        idx = np.flatnonzero(m)
        best = idx[np.lexsort((idx, rts[idx]))[-1]]
        want.append((i, best, right["o_totalprice"][best]))
    want = pd.DataFrame(want, columns=["event_id", "o_orderkey",
                                       "o_totalprice"])
    assert len(got) == len(want)
    assert (got["event_id"].to_numpy() == want["event_id"].to_numpy()).all()
    assert (got["o_orderkey"].to_numpy()
            == want["o_orderkey"].to_numpy()).all()
    assert np.allclose(got["o_totalprice"], want["o_totalprice"])


@pytest.mark.usefixtures("ray_session")
def test_range_join_agg_planted():
    """Sweep-line range join vs brute force: inclusive window edges,
    empty-window left rows kept with zeros, key isolation."""
    from probly_search_ray.stages.joins import range_join_agg
    rng = np.random.default_rng(23)
    nl, nr = 250, 180
    lk = rng.integers(0, 15, nl)
    lts = rng.integers(1000, 3000, nl)
    rk = rng.integers(0, 18, nr)
    rts = rng.integers(500, 3500, nr)
    # planted boundary hits: right rows exactly AT window lo and hi
    W = 100
    rk[:4] = lk[:4]
    rts[0], rts[1] = lts[0] - W, lts[1]          # inclusive edges
    rts[2], rts[3] = lts[2] - W - 1, lts[3] + 1  # just outside
    rv = rng.random(nr).round(6)
    left = pd.DataFrame({
        "event_id": np.arange(nl, dtype=np.int64), "user_id": lk,
        "ts": pd.to_datetime(lts, unit="us")})
    right = pd.DataFrame({
        "o_custkey": rk, "o_orderdate": pd.to_datetime(rts, unit="us"),
        "o_totalprice": rv})
    got = range_join_agg(
        ray.data.from_pandas(left).repartition(5),
        ray.data.from_pandas(right).repartition(4),
        left_key="user_id", left_ts="ts", right_key="o_custkey",
        right_ts="o_orderdate", left_id="event_id",
        right_val="o_totalprice", window_us=W, num_buckets=7) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)

    n_want = np.zeros(nl, dtype=np.int64)
    s_want = np.zeros(nl)
    for i in range(nl):
        m = (rk == lk[i]) & (rts >= lts[i] - W) & (rts <= lts[i])
        n_want[i] = m.sum()
        s_want[i] = rv[m].sum()
    assert len(got) == nl
    assert (got["n_matched"].to_numpy() == n_want).all()
    assert np.allclose(got["sum_val"], s_want.round(6), atol=1e-6)
    # the planted boundary rows behaved: inclusive edges matched,
    # outside-by-one did not
    assert n_want[0] >= 1 and n_want[1] >= 1


@pytest.mark.usefixtures("ray_session")
def test_hll_distinct():
    """HLL sketch: ≤5% error vs exact at p=12 (~1.6% stderr), and the
    merged registers are BLOCK-LAYOUT INVARIANT (max-merge of a
    deterministic hash), so the estimate is exactly reproducible."""
    from probly_search_ray.stages.sketches import (
        hll_distinct, hll_registers, hll_estimate)
    rng = np.random.default_rng(31)
    rows = pd.DataFrame({
        "event_type": np.repeat(["a", "b", "c"], [30000, 8000, 500]),
        "user_id": np.concatenate([
            rng.integers(0, 7000, 30000),      # ~7k distinct, heavy dups
            rng.integers(0, 2500, 8000),
            np.arange(500),                    # all distinct
        ]).astype(np.int64)})
    exact = rows.groupby("event_type")["user_id"].nunique()
    for nblocks in (1, 7):
        got = hll_distinct(
            ray.data.from_pandas(rows.sample(frac=1, random_state=0))
            .repartition(nblocks),
            "event_type", "user_id").to_pandas() \
            .set_index("event_type")["est_distinct"]
        for t in ("a", "b", "c"):
            err = abs(got[t] - exact[t]) / exact[t]
            assert err <= 0.05, (t, got[t], exact[t], nblocks)
    # register-level determinism: one pass == max-merge of two halves
    vals = rng.integers(0, 10**9, 5000).astype(np.int64)
    one = hll_registers(vals)
    two = np.maximum(hll_registers(vals[:2000]), hll_registers(vals[2000:]))
    assert (one == two).all()
    assert abs(hll_estimate(one) - 5000) / 5000 < 0.05


@pytest.mark.usefixtures("ray_session")
def test_topk_terms_sketch_zipf():
    """Heavy-hitters sketch on a zipf corpus LARGE enough to force
    per-batch truncation: bounds must always contain the true df, and
    when the run certifies, the top-k SET must equal the exact one."""
    from probly_search_ray.stages.sketches import topk_terms_sketch
    rng = np.random.default_rng(7)
    toks = np.minimum(rng.zipf(1.3, size=400_000), 30_000)
    exact = pd.Series(toks).value_counts()
    docs = pd.DataFrame({
        "doc_id": np.arange(5000, dtype=np.int64),
        "text": ["w" + " w".join(map(str, chunk))
                 for chunk in np.array_split(toks, 5000)]})
    ds = ray.data.from_pandas(docs).repartition(8)

    out, certified = topk_terms_sketch(ds, m=512, k=20)
    assert len(out) == 20 and (out["df_lo"] <= out["df_hi"]).all()
    for _, r in out.iterrows():
        true = int(exact.get(int(r["term"][1:]), 0))
        assert r["df_lo"] <= true <= r["df_hi"], (r["term"], true)
    want = {"w" + str(t) for t in
            exact.sort_values(ascending=False).head(20).index}
    if certified:
        assert set(out["term"]) == want
    # zipf head is far above the truncation cut → m=512 must certify
    assert certified

    # tiny m: certification should fail but the bounds must still hold
    out2, cert2 = topk_terms_sketch(ds, m=8, k=20)
    for _, r in out2.iterrows():
        true = int(exact.get(int(r["term"][1:]), 0))
        assert r["df_lo"] <= true <= r["df_hi"]


@pytest.mark.usefixtures("ray_session")
def test_grouped_quantiles_exact():
    """Histogram quantiles == numpy lower-nearest-rank, any layout."""
    from probly_search_ray.stages.sketches import grouped_quantiles
    rng = np.random.default_rng(13)
    df = pd.DataFrame({
        "src": np.repeat(["x", "y", "z"], [4000, 1500, 7]),
        "val": np.concatenate([
            rng.integers(0, 120, 4000),
            rng.poisson(40, 1500),
            np.arange(7)]).astype(np.int64)})

    def val_fn(b):
        return (b["src"].to_numpy(zero_copy_only=False),
                b["val"].to_numpy(zero_copy_only=False))

    for nblocks in (1, 5):
        got = grouped_quantiles(
            ray.data.from_pandas(df.sample(frac=1, random_state=1))
            .repartition(nblocks), "src", val_fn, qs=(0.5, 0.9, 0.99)) \
            .to_pandas().set_index("src").sort_index()
        for s, g in df.groupby("src"):
            v = np.sort(g["val"].to_numpy())
            for q, col in ((0.5, "q50"), (0.9, "q90"), (0.99, "q99")):
                want = v[max(int(np.ceil(q * len(v))), 1) - 1]
                assert got.loc[s, col] == want, (s, col, nblocks)


@pytest.mark.usefixtures("ray_session")
def test_unicode_token_hashing():
    """Regression (fuzz_curation seed 40000): ``hash_tokens_u64`` on the
    object-dtype arrays Arrow hands every stage raised UnicodeEncodeError
    for non-ASCII tokens (bare astype("S16") encodes ASCII) — crashing
    token_stats / repetition / decontaminate / fingerprints / the term
    sketch on any real webtext.  Object and U dtypes must hash alike,
    ASCII hashes must match the historical path, and the consuming
    stages must run end-to-end on a unicode corpus."""
    from probly_search_ray.functions.hashing import hash_tokens_u64
    toks = ["the", "über", "日本", "ε", "x" * 40]
    ho = hash_tokens_u64(np.array(toks, dtype=object))
    hu = hash_tokens_u64(np.array(toks))
    assert (ho == hu).all() and len(set(ho.tolist())) == len(toks)

    rows = [{"doc_id": 1, "text": "über über 日本 ε"},
            {"doc_id": 2, "text": "the ε the"},
            {"doc_id": 3, "text": "日本 über 日本 über 日本"}]
    ts = curation.repetition_stats(_docs_ds(rows)).to_pandas() \
        .set_index("doc_id")
    assert ts.loc[1, "top_token_frac"] == pytest.approx(0.5)
    assert ts.loc[3, "top_bigram_frac"] == pytest.approx(0.5)
    from probly_search_ray.stages.textstats import token_stats
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array(["über ε über", "日本"])})
    st = token_stats(t).to_pandas().set_index("doc_id")
    assert st.loc[1, "n_tokens"] == 3 and st.loc[1, "n_unique"] == 2
    from probly_search_ray.stages.sketches import topk_terms_sketch
    out, certified = topk_terms_sketch(_docs_ds(rows), k=3)
    assert certified
    # counts: über 4, 日本 4, ε 2, the 2; ties break term-asc by code
    # point ('ü' U+00FC < '日' U+65E5; 't' < 'ε' U+03B5)
    assert list(out["term"]) == ["über", "日本", "the"]
    assert list(out["df_lo"]) == [4, 4, 2]

    # the >4096-token factorize fast path must be bit-identical to the
    # direct encode chain — including None (pd.factorize normalizes
    # None -> nan, which must NOT change the hash vs small arrays)
    big = np.array((["the", "über", "日本", None, "x" * 40] * 1200),
                   dtype=object)
    hb = hash_tokens_u64(big)
    hs = hash_tokens_u64(big[:5])
    assert (hb[:5] == hs).all() and (hb.reshape(-1, 5) == hs).all()


@pytest.mark.usefixtures("ray_session")
def test_sliding_window_epoch_edge(tmp_path):
    """Regression (fuzz_curation seed 40001): an event inside the
    epoch's first hop fans out to window index -1; the packed
    (type_code << 40 | wi) key turned that into an all-ones key
    (merging event types) and indexed the type dictionary at -1.
    The oracle SQL's semantics: window_start may be -30 min."""
    import pyarrow.parquet as pq
    from probly_search_ray.pipelines.queries import events_sliding
    ev = pd.DataFrame({
        "ts": pd.to_datetime([600, 900, 2_000, 4_000], unit="s"),
        "event_type": ["click", "view", "click", "click"],
        "value": [1.25, 2.5, 4.0, 8.0],
    })
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = events_sliding(str(tmp_path)).to_pandas()
    got["ws"] = got["window_start"].astype("datetime64[us]") \
        .astype(np.int64) // 1_000_000
    got = got.set_index(["event_type", "ws"]).sort_index()
    # ts=600,900 -> windows {-1800, 0}; 2000 -> {0, 1800}; 4000 -> {1800, 3600}
    assert got.loc[("click", -1800), "n"] == 1
    assert got.loc[("click", -1800), "sum_value"] == pytest.approx(1.25)
    assert got.loc[("view", -1800), "n"] == 1
    assert got.loc[("click", 0), "n"] == 2          # ts=600 and ts=2000
    assert got.loc[("click", 0), "sum_value"] == pytest.approx(5.25)
    assert got.loc[("click", 1800), "n"] == 2       # ts=2000 and ts=4000
    assert got.loc[("click", 3600), "n"] == 1
    assert int(got["n"].sum()) == 8                 # every event in 2 windows

    # pre-epoch timestamps (negative window indices beyond -1) must
    # survive the packed-key rebase in BOTH window aggregates
    from probly_search_ray.pipelines.queries import events_hourly
    ev2 = pd.DataFrame({
        "ts": pd.to_datetime([-7000, -100, 600], unit="s"),
        "event_type": ["click", "view", "click"],
        "value": [1.0, 2.0, 4.0],
    })
    pq.write_table(pa.Table.from_pandas(ev2, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    gh = events_hourly(str(tmp_path)).to_pandas()
    gh["ws"] = gh["window_start"].astype("datetime64[us]") \
        .astype(np.int64) // 1_000_000
    gh = gh.set_index(["event_type", "ws"]).sort_index()
    assert gh.loc[("click", -7200), "n"] == 1       # ts=-7000 -> hour -2
    assert gh.loc[("view", -3600), "n"] == 1        # ts=-100 -> hour -1
    assert gh.loc[("click", 0), "n"] == 1
    gs = events_sliding(str(tmp_path)).to_pandas()
    gs["ws"] = gs["window_start"].astype("datetime64[us]") \
        .astype(np.int64) // 1_000_000
    gs = gs.set_index(["event_type", "ws"]).sort_index()
    # ts=-7000 -> hops {-7200, -9000}; ts=-100 -> {-1800, -3600}
    assert gs.loc[("click", -9000), "n"] == 1
    assert gs.loc[("view", -3600), "n"] == 1
    assert int(gs["n"].sum()) == 6


@pytest.mark.usefixtures("ray_session")
def test_all_null_text_block():
    """Regression (fuzz_curation seed 77072): a block whose every text
    is null arrives as Arrow type ``null`` (all-None object column
    through from_pandas), where ``fill_null("")`` raises ArrowInvalid —
    crashing every tokenizing stage on an all-null block.  All such
    stages must treat it as empty docs instead."""
    docs = pd.DataFrame({"doc_id": np.array([1, 2], np.int64),
                         "text": [None, None]})
    ds = ray.data.from_pandas(docs)
    out = curation.decontaminate(ds, bench_mod=2).to_pandas()
    assert list(out["doc_id"]) == [1] and out.loc[0, "n_overlap"] == 0
    out = curation.repetition_stats(ds).to_pandas()
    assert len(out) == 2 and (out["top_token_frac"] == 0).all()
    out = curation.redact_patterns(ds).to_pandas()
    assert list(out["text_clean"]) == ["", ""]
    from probly_search_ray.stages.textstats import token_stats
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": pa.array([None, None], pa.null())})
    st = token_stats(t).to_pandas()
    assert (st["n_tokens"] == 0).all()
