"""Deterministic synthetic Common-Crawl-style pages corpus.

Input-table shape per BASELINE.json ``input_hint``:
    url:string, warc_ts:timestamp[us], html:binary, text:string,
    lang:string  (+ doc_id:uint64 assigned from deterministic row order)

``text`` is drawn from a Zipfian vocabulary so hot/stopword terms exist
for skew testing; ``html`` is a deterministic wrapper embedding the
exact ``text`` bytes so the per-url byte-identical extracted-text
invariant is checkable (FIXTURES.md EXTRACT-1).  Everything is keyed on
(seed, file index, row index) — no external data, reproducible across
runs and parallelism levels.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = ["en", "de", "es", "fr", "zh"]
_SYL = ["ba", "ne", "to", "ri", "mu", "sa", "ke", "lo", "vi", "da",
        "pu", "ze", "qua", "fen", "gor", "hil", "jam", "wex", "yon", "crat"]


def make_vocab(vocab_size: int, seed: int = 42) -> np.ndarray:
    """Deterministic pronounceable vocabulary (vectorized; 1-4 syllable
    words give ~168k distinct combinations)."""
    rng = np.random.default_rng(seed)
    syl = np.asarray(_SYL)
    words: list[str] = []
    seen: set[str] = set()
    while len(words) < vocab_size:
        need = vocab_size - len(words)
        ks = rng.integers(1, 5, size=need * 2)
        parts = rng.integers(0, len(syl), size=(len(ks), 4))
        for row, k in zip(parts, ks):
            w = "".join(syl[row[:k]])
            if w not in seen:
                seen.add(w)
                words.append(w)
                if len(words) == vocab_size:
                    break
    return np.asarray(words)


def zipf_probs(vocab_size: int, s: float = 1.07) -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, vocab_size + 1, dtype=np.float64), s)
    return p / p.sum()


def page_html(title: str, text: str) -> bytes:
    return (f'<html><head><meta charset="utf-8"><title>{title}</title></head>'
            f'<body><h1>{title}</h1><p class="main">{text}</p>'
            f'<footer>synthetic</footer></body></html>').encode()


def generate_pages(out_dir: str, num_docs: int, num_files: int = 8,
                   seed: int = 42, vocab_size: int = 20000,
                   zipf_s: float = 1.07, mean_len: int = 60,
                   force: bool = False) -> list[str]:
    """Write a deterministic pages corpus; returns the file list.
    Skips generation when the directory already matches (same params
    recorded in a marker file)."""
    marker = os.path.join(
        out_dir, f".synth-{num_docs}-{num_files}-{seed}-{vocab_size}"
                 f"-{zipf_s}-{mean_len}")
    files = [os.path.join(out_dir, f"pages-{i:04d}.parquet")
             for i in range(num_files)]
    if not force and os.path.exists(marker) and all(map(os.path.exists, files)):
        return files
    os.makedirs(out_dir, exist_ok=True)
    vocab = make_vocab(vocab_size, seed)
    probs = zipf_probs(vocab_size, zipf_s)
    per_file = (num_docs + num_files - 1) // num_files

    args = [(fi, files[fi], min(per_file, max(num_docs - fi * per_file, 0)))
            for fi in range(num_files)]
    try:
        import ray
        if not ray.is_initialized():
            raise RuntimeError("no ray session")
        vocab_ref = ray.put(vocab)
        probs_ref = ray.put(probs)
        gen = ray.remote(num_cpus=1)(_gen_one_file)
        ray.get([gen.remote(fi, path, n, seed, per_file, mean_len,
                            vocab_ref, probs_ref)
                 for fi, path, n in args])
    except Exception:
        for fi, path, n in args:
            _gen_one_file(fi, path, n, seed, per_file, mean_len, vocab, probs)
    with open(marker, "w") as f:
        f.write("ok")
    return files


def _gen_one_file(fi: int, path: str, n: int, seed: int, per_file: int,
                  mean_len: int, vocab, probs) -> None:
    """Deterministic per-file generation (keyed on (seed, file index)) —
    identical output whether run serially or as a Ray task."""
    base_ts = np.datetime64("2024-08-07T00:00:00", "us")
    rng = np.random.default_rng((seed, fi))
    doc_ids = np.arange(fi * per_file, fi * per_file + n, dtype=np.uint64)
    lens = np.maximum(rng.poisson(mean_len, size=n), 1)
    total = int(lens.sum())
    toks = rng.choice(vocab, size=total, p=probs)
    offs = np.concatenate(([0], np.cumsum(lens)))
    texts = [" ".join(toks[offs[i]:offs[i + 1]]) for i in range(n)]
    title_lens = rng.integers(2, 6, size=n)
    ttoks = rng.choice(vocab, size=int(title_lens.sum()), p=probs)
    toffs = np.concatenate(([0], np.cumsum(title_lens)))
    titles = [" ".join(ttoks[toffs[i]:toffs[i + 1]]) for i in range(n)]
    urls = [f"https://example.com/{fi}/{i}" for i in range(n)]
    htmls = [page_html(t, x) for t, x in zip(titles, texts)]
    langs = [LANGS[int(x)] for x in rng.integers(0, len(LANGS), size=n)]
    ts = base_ts + (doc_ids.astype(np.int64) * 1000)
    table = pa.table({
        "doc_id": pa.array(doc_ids, type=pa.uint64()),
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(ts),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })
    pq.write_table(table, path)
