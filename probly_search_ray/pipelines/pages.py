"""Flagship pipeline: Common-Crawl-style pages → inverted index → search.

read_parquet(pages, columns=[doc_id, html])       # prune: html only
  → map_batches(ExtractHtml)                      # title/text fields
  → SegmentEncoder → sort(term) → shards          # build_index
then: SearchEngine over (title, text) with per-field boosts — the
two-field search the reference demonstrates (README.md recipe demo,
tests/integrations_tests.rs).
"""

from __future__ import annotations

from probly_search_ray.build import build_index
from probly_search_ray.stages.extract import ExtractHtml

PAGE_FIELDS = ["title", "text"]


def build_pages_index(pages_paths, index_dir: str, **kwargs) -> dict:
    return build_index(
        pages_paths, index_dir,
        key_col="doc_id",
        field_cols=PAGE_FIELDS,
        read_cols=["doc_id", "html"],
        pre_transform=ExtractHtml("html", keep=["doc_id"]),
        **kwargs,
    )
