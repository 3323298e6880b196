"""HTML → field extraction stage.

The reference's ``FieldAccessor`` hook (``/root/reference/src/lib.rs:11``)
projects text out of an opaque document; here the opaque payload is the
``html:binary`` column of a Common-Crawl-style pages table, and the
accessor is a vectorized ``map_batches`` stage producing ``title`` and
``text`` string columns.

The per-row invariant (BASELINE.json input_hint): extracted ``text``
must be *byte-identical* to the page's ``text`` column, per url —
pinned by EXTRACT-1 tests and checkable at scale with
``check_extraction``.

The extractor is regex-based and matched to the deterministic synthetic
wrapper (a real deployment would plug an HTML parser into the same
stage; the Ray-side plumbing — schema, batching, zero-copy — is what
this stage pins down).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_PATTERN = (r'(?s)<title>(?P<title>[^<]*)</title>.*'
            r'<p class="main">(?P<text>.*)</p>')


class ExtractHtml:
    """map_batches stage: html binary → title/text columns (keeps the
    key column and any requested passthrough columns)."""

    def __init__(self, html_col: str = "html", keep: list[str] | None = None):
        self.html_col = html_col
        self.keep = keep

    def __call__(self, batch: pa.Table) -> pa.Table:
        html = batch[self.html_col]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        s = html.cast(pa.string())
        ext = pc.extract_regex(s, _PATTERN)
        title = pc.struct_field(ext, "title").fill_null("")
        text = pc.struct_field(ext, "text").fill_null("")
        keep = self.keep if self.keep is not None else [
            c for c in batch.column_names if c != self.html_col]
        out = {c: batch[c] for c in keep if c in batch.column_names
               and c not in ("title", "text")}
        out["title"] = title
        out["text"] = text
        return pa.table(out)


def check_extraction(pages_ds, html_col: str = "html",
                     text_col: str = "text") -> int:
    """Count rows whose extracted text is NOT byte-identical to the
    stored text column.  Streams; returns the mismatch count."""
    def _cmp(batch: pa.Table) -> pa.Table:
        html = batch[html_col]
        if isinstance(html, pa.ChunkedArray):
            html = html.combine_chunks()
        ext = pc.extract_regex(html.cast(pa.string()), _PATTERN)
        text = pc.struct_field(ext, "text").fill_null("\x00missing")
        bad = pc.cast(pc.not_equal(text, batch[text_col]), pa.int64())
        return pa.table({"mismatch": bad})

    from ray.data.aggregate import Sum
    out = pages_ds.map_batches(_cmp, batch_format="pyarrow") \
                  .aggregate(Sum("mismatch", alias_name="mismatches"))
    return int(out["mismatches"])
