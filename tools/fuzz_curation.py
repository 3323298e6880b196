"""Randomized differential fuzz for the CURATION / textstats / sketch
/ window operators — decontamination, regex redaction, repetition
stats, unigram-LM scoring, token-budget shard packing, stratified
sampling, per-source quota, the certified top-k term sketch, token /
quality / langid stats, and the tumbling + hopping window aggregates —
vs brute-force pure-Python/pandas references on random tiny corpora.

The driver oracles pin these ops on the FIXED testdata corpus; this
harness stresses what fixed data cannot: null texts, empty strings,
double/leading/trailing spaces (empty-token drops), multi-byte unicode
tokens (code-point vs byte lengths), docs shorter than the shingle
width, all-benchmark and no-benchmark corpora, budget=1 shard packing,
quota n larger than every group, sketch truncation (m smaller than the
batch vocab) and its certification contract, and window indices
landing exactly on hour/hop boundaries.

Float discipline: event ``value`` columns are exact binary fractions
(quarters) so window sums are exact; fraction/logprob comparisons use
``np.round`` on BOTH sides over bit-identical float64 intermediates
(same division / same log table), with a 2e-6 band where association
order may differ (ADVICE-r4 pattern).

Run from the repo root:  FUZZ_SEEDS=60 python tools/fuzz_curation.py
(owns its Ray session, like bench.py / the other tools/ harnesses).
"""
import collections
import math
import os
import re
import sys
import tempfile
import time
import traceback

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tools"))

from fuzz_pipeline import _pd  # noqa: E402  (shared all-empty helper)
from probly_search_ray.stages.curation import (  # noqa: E402
    decontaminate, pack_shards, redact_patterns, repetition_stats,
    sample_stratified, source_quota, unigram_logprob)
from probly_search_ray.stages.sketches import topk_terms_sketch  # noqa: E402
from probly_search_ray.stages.textstats import (  # noqa: E402
    LANG_PROFILES, LangId, QualityScore, token_stats)

N_SEEDS = int(os.environ.get("FUZZ_SEEDS", "60"))
START = int(os.environ.get("FUZZ_START", "40000"))

# vocab mixes the engine's stopword/langid profile words, generic
# tokens, and multi-byte unicode (code-point vs byte length stress)
_VOCAB = ["the", "a", "and", "of", "to", "der", "die", "und", "el",
          "la", "que", "alpha", "beta", "gamma", "delta", "über",
          "日本", "ε", "zzz"]


def _tok(text) -> list:
    """The engine's tokenizer contract: split on single spaces, drop
    empty tokens, null -> ''."""
    if text is None:
        return []
    return [t for t in text.split(" ") if t]


def _docs(rng, n_min=1, n_max=60) -> pd.DataFrame:
    n = int(rng.integers(n_min, n_max))
    texts = []
    for _ in range(n):
        r = rng.random()
        if r < 0.06:
            texts.append(None)
        elif r < 0.12:
            texts.append("")
        else:
            k = int(rng.integers(0, 14))
            toks = list(rng.choice(_VOCAB, size=k))
            # repetition runs (stress top-token/bigram fractions)
            if k and rng.random() < 0.4:
                w = str(rng.choice(_VOCAB))
                pos = int(rng.integers(0, k))
                toks[pos:pos] = [w] * int(rng.integers(1, 6))
            s = " ".join(toks)
            if rng.random() < 0.25:           # empty-token stress
                s = s.replace(" ", "  ", 1) if " " in s else s + " "
            if rng.random() < 0.15:
                s = " " + s
            texts.append(s)
    ids = rng.permutation(np.arange(1, n + 1)).astype(np.int64)
    if rng.random() < 0.3:                    # big-id stress
        ids = ids + np.int64(rng.choice([10_000, 1 << 33]))
    src = rng.choice([f"s{i}" for i in range(4)], size=n)
    return pd.DataFrame({"doc_id": ids, "text": texts, "source": src})


def _cmp(got: pd.DataFrame, exp: pd.DataFrame, ctx: str, atol=0.0):
    cols = sorted(exp.columns)
    assert sorted(got.columns) == cols, \
        f"{ctx}: columns {sorted(got.columns)} != {cols}"
    g = got[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    e = exp[cols].sort_values(cols, kind="stable").reset_index(drop=True)
    assert len(g) == len(e), f"{ctx}: rows {len(g)} != {len(e)}\n{g}\n{e}"
    for c in cols:
        gv, ev = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype.kind == "f" or ev.dtype.kind == "f":
            ok = np.allclose(gv.astype(np.float64), ev.astype(np.float64),
                             rtol=0, atol=max(atol, 1e-12))
        else:
            ok = bool(np.array_equal(gv, ev))
        assert ok, f"{ctx}: column {c} mismatch\ngot\n{g}\nexp\n{e}"


# ------------------------------------------------------------- operators

def check_decontam(rng, docs, ctx):
    w = int(rng.choice([2, 3]))
    mod = int(rng.choice([2, 3, 7]))
    got = _pd(decontaminate(ray.data.from_pandas(docs[["doc_id", "text"]]),
                            bench_mod=mod, w=w))
    bench = set()
    for r in docs.itertuples():
        if r.doc_id % mod == 0:
            toks = _tok(r.text)
            bench |= {tuple(toks[i:i + w])
                      for i in range(len(toks) - w + 1)}
    rows = []
    for r in docs.itertuples():
        if r.doc_id % mod == 0:
            continue
        toks = _tok(r.text)
        sh = {tuple(toks[i:i + w]) for i in range(len(toks) - w + 1)}
        nov = len(sh & bench)
        rows.append((r.doc_id, np.int64(nov), np.int64(nov > 0)))
    exp = pd.DataFrame(rows, columns=["doc_id", "n_overlap",
                                      "contaminated"])
    if not len(rows):
        exp = exp.astype(np.int64)
    _cmp(got, exp, f"{ctx} decontam w={w} mod={mod}")


def check_redact(rng, docs, ctx):
    pat = str(rng.choice([r"\b(alpha|beta)\b", r"\bthe\b", r"über"]))
    got = _pd(redact_patterns(ray.data.from_pandas(docs[["doc_id", "text"]]),
                              pattern=pat))
    rows = []
    for r in docs.itertuples():
        t = r.text or ""
        rows.append((r.doc_id, np.int64(len(re.findall(pat, t))),
                     re.sub(pat, "[REDACTED]", t)))
    exp = pd.DataFrame(rows, columns=["doc_id", "n_redacted",
                                      "text_clean"])
    _cmp(got, exp, f"{ctx} redact pat={pat}")


def check_repetition(rng, docs, ctx):
    got = _pd(repetition_stats(
        ray.data.from_pandas(docs[["doc_id", "text"]])))
    rows = []
    for r in docs.itertuples():
        toks = _tok(r.text)
        n = len(toks)
        top_tok = max(collections.Counter(toks).values()) if n else 0
        bigs = list(zip(toks, toks[1:]))
        top_big = max(collections.Counter(bigs).values()) if bigs else 0
        rows.append((r.doc_id,
                     np.round(top_tok / max(n, 1), 6),
                     np.round(top_big / max(n - 1, 1), 6)))
    exp = pd.DataFrame(rows, columns=["doc_id", "top_token_frac",
                                      "top_bigram_frac"])
    _cmp(got, exp, f"{ctx} repetition")


def check_unigram_lm(rng, docs, ctx):
    cnt = collections.Counter()
    for t in docs["text"]:
        cnt.update(_tok(t))
    if not cnt:
        return
    freq_df = pd.DataFrame({"term": list(cnt), "df": list(cnt.values())})
    got = _pd(unigram_logprob(ray.data.from_pandas(docs[["doc_id", "text"]]),
                              freq_df))
    total = sum(cnt.values())
    # identical log table as the engine (np.log over float64)
    lp = {t: float(np.log(c / float(total))) for t, c in cnt.items()}
    rows = []
    for r in docs.itertuples():
        toks = _tok(r.text)
        if not toks:
            continue
        rows.append((r.doc_id,
                     np.round(math.fsum(lp[t] for t in toks) / len(toks),
                              6)))
    exp = pd.DataFrame(rows, columns=["doc_id", "logprob"])
    _cmp(got, exp, f"{ctx} unigram_lm", atol=2e-6)


def check_pack_shards(rng, docs, ctx):
    budget = int(rng.choice([1, 7, 500]))
    got = _pd(pack_shards(ray.data.from_pandas(docs[["doc_id", "text"]]),
                          budget=budget))
    d = docs.sort_values("doc_id")
    lens = d["text"].map(lambda t: len(_tok(t))).to_numpy(np.int64)
    cum_prev = np.cumsum(lens) - lens
    exp = pd.DataFrame({"doc_id": d["doc_id"].to_numpy(),
                        "n_tokens": lens,
                        "shard_id": cum_prev // budget})
    _cmp(got, exp, f"{ctx} pack budget={budget}")


def check_sample(rng, docs, ctx):
    got = _pd(sample_stratified(
        ray.data.from_pandas(docs[["doc_id", "source"]])))
    rows = []
    for s, g in docs.groupby("source"):
        tot = len(g)
        smp = sum(1 for i in g["doc_id"]
                  if ((int(i) % (1 << 32)) * 2654435761) % (1 << 32)
                  % 10 == 3)
        rows.append((s, np.int64(tot), np.int64(smp)))
    exp = pd.DataFrame(rows, columns=["source", "n_total", "n_sampled"])
    _cmp(got, exp, f"{ctx} sample")


def check_quota(rng, docs, ctx):
    n = int(rng.choice([1, 3, 100]))
    mb = int(rng.choice([1, 4, 64]))
    got = _pd(source_quota(ray.data.from_pandas(docs[["doc_id", "source"]]),
                           n=n, merge_buckets=mb))
    keep = docs.sort_values("doc_id").groupby("source").head(n)
    exp = keep[["doc_id", "source"]].reset_index(drop=True)
    _cmp(got, exp, f"{ctx} quota n={n} mb={mb}")


def check_sketch(rng, docs, ctx):
    m = int(rng.choice([2, 5, 4096]))
    k = int(rng.integers(1, 9))
    out, certified = topk_terms_sketch(
        ray.data.from_pandas(docs[["doc_id", "text"]]), m=m, k=k)
    cnt = collections.Counter()
    for t in docs["text"]:
        cnt.update(_tok(t))
    true = dict(cnt)
    # under truncation (m < batch vocab) the sketch may have dropped a
    # term from every batch it appeared in and return < k rows — but
    # then it must NOT certify unless the exclusion bound collapses
    assert len(out) <= min(k, len(true)), \
        f"{ctx} sketch m={m} k={k}: {len(out)} rows, vocab {len(true)}"
    if m == 4096:
        assert len(out) == min(k, len(true)), \
            f"{ctx} sketch k={k}: {len(out)} rows, vocab {len(true)}"
    for r in out.itertuples():
        tc = true[r.term]
        assert r.df_lo <= tc <= r.df_hi, \
            f"{ctx} sketch m={m}: term {r.term} true={tc} " \
            f"not in [{r.df_lo},{r.df_hi}]"
    if certified and len(true):
        ret = set(out["term"])
        exc_max = max((c for t, c in true.items() if t not in ret),
                      default=0)
        ret_min = min(true[t] for t in ret)
        assert ret_min >= exc_max, \
            f"{ctx} sketch m={m}: certified but excluded count " \
            f"{exc_max} > returned min {ret_min}"
    if m == 4096:     # no truncation anywhere -> exact, ordered top-k
        assert certified, f"{ctx} sketch: untruncated not certified"
        order = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        # positional compare: the (df_lo desc, term asc) ORDER is part
        # of the contract (a value-sorting _cmp would mask rank bugs)
        assert list(out["term"]) == [t for t, _ in order] \
            and list(out["df_lo"]) == [c for _, c in order] \
            and list(out["df_hi"]) == [c for _, c in order], \
            f"{ctx} sketch exact k={k}: {out.values.tolist()} != {order}"


def check_textstats(rng, docs, ctx):
    t = pa.Table.from_pandas(docs[["doc_id", "text"]],
                             preserve_index=False)
    got = token_stats(t).to_pandas()
    rows = [(r.doc_id, np.int64(len(_tok(r.text))),
             np.int64(len(set(_tok(r.text))))) for r in docs.itertuples()]
    exp = pd.DataFrame(rows, columns=["doc_id", "n_tokens", "n_unique"])
    _cmp(got, exp, f"{ctx} token_stats")

    got = QualityScore()(t).to_pandas()
    rows = []
    for r in docs.itertuples():
        toks = _tok(r.text)
        n = len(toks)
        stop = sum(1 for x in toks if x in
                   {"the", "a", "and", "of", "to"})
        chars = sum(len(x) for x in toks)   # code points, not bytes
        rows.append((r.doc_id, np.int64(n),
                     np.round(stop / max(n, 1), 6),
                     np.round(chars / max(n, 1), 6)))
    exp = pd.DataFrame(rows, columns=["doc_id", "n_tokens",
                                      "stopword_ratio", "avg_token_len"])
    _cmp(got, exp, f"{ctx} quality")

    got = LangId()(t).to_pandas()
    langs = sorted(LANG_PROFILES)
    rows = []
    for r in docs.itertuples():
        toks = _tok(r.text)
        hits = [sum(1 for x in toks if x in LANG_PROFILES[l])
                for l in langs]
        best = int(np.argmax(hits)) if toks else 0
        rows.append((r.doc_id,
                     langs[best] if toks and hits[best] > 0 else "und"))
    exp = pd.DataFrame(rows, columns=["doc_id", "pred_lang"])
    _cmp(got, exp, f"{ctx} langid")


# ------------------------------------------------------------- windows

def _write_events(rng, tmpdir) -> pd.DataFrame:
    n = int(rng.integers(1, 150))
    # minute grid over ~5h; some rows land exactly on hour/hop edges
    ts = rng.integers(0, 300, size=n) * 60_000_000
    ev = pd.DataFrame({
        "ts": ts.astype("datetime64[us]"),
        "event_type": rng.choice(["click", "view", "buy"], size=n),
        "value": rng.integers(-40, 400, size=n).astype(np.float64) / 4.0,
    })
    pq.write_table(pa.Table.from_pandas(ev, preserve_index=False),
                   os.path.join(tmpdir, "events.parquet"))
    return ev


def check_windows(rng, tmpdir, ctx):
    from probly_search_ray.pipelines.queries import (events_hourly,
                                                     events_sliding)
    ev = _write_events(rng, tmpdir)
    us = ev["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)

    got = _pd(events_hourly(tmpdir))
    HOUR = 3600 * 1_000_000
    d = ev.assign(window_start=((us // HOUR) * HOUR)
                  .astype("datetime64[us]"))
    exp = d.groupby(["event_type", "window_start"], as_index=False).agg(
        n=("value", "size"), sum_value=("value", "sum"))
    exp["n"] = exp["n"].astype(np.int64)
    exp["sum_value"] = exp["sum_value"].round(6)
    _cmp(got, exp, f"{ctx} hourly", atol=1e-9)

    got = _pd(events_sliding(tmpdir))
    HOP = 1800 * 1_000_000
    wi = us // HOP
    d2 = pd.concat([
        ev.assign(window_start=(wi * HOP).astype("datetime64[us]")),
        ev.assign(window_start=((wi - 1) * HOP).astype("datetime64[us]")),
    ])
    exp = d2.groupby(["event_type", "window_start"], as_index=False).agg(
        n=("value", "size"), sum_value=("value", "sum"))
    exp["n"] = exp["n"].astype(np.int64)
    exp["sum_value"] = exp["sum_value"].round(6)
    _cmp(got, exp, f"{ctx} sliding", atol=1e-9)


def run_seed(seed):
    rng = np.random.default_rng(seed)
    ctx = f"seed={seed}"
    docs = _docs(rng)
    check_decontam(rng, docs, ctx)
    check_redact(rng, docs, ctx)
    check_repetition(rng, docs, ctx)
    check_unigram_lm(rng, docs, ctx)
    check_pack_shards(rng, docs, ctx)
    check_sample(rng, docs, ctx)
    check_quota(rng, docs, ctx)
    check_sketch(rng, docs, ctx)
    check_textstats(rng, docs, ctx)
    with tempfile.TemporaryDirectory(prefix="fuzz_cur_") as td:
        check_windows(rng, td, ctx)


def main():
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    fails = 0
    t0 = time.time()
    done = 0
    for seed in range(START, START + N_SEEDS):
        done += 1
        try:
            run_seed(seed)
        except Exception:
            fails += 1
            print(f"FAIL seed={seed}", flush=True)
            traceback.print_exc()
            if fails >= 3:
                break
        if done % 5 == 0:
            print(f"{done}/{N_SEEDS} seeds, {time.time()-t0:.0f}s, "
                  f"fails={fails}", flush=True)
    print(f"CURATION_FUZZ_DONE fails={fails} seeds={done} "
          f"elapsed={time.time()-t0:.0f}s", flush=True)
    ray.shutdown()
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
