"""probly-search-ray: Ray-Data-native inverted-index + BM25 engine with
probly-search semantics, plus training-data pipeline operators.

Public API:

    from probly_search_ray import build_index, SearchEngine
    build_index("pages/*.parquet", "/mnt/idx", field_cols=["text"])
    eng = SearchEngine("/mnt/idx", num_shards=4, use_actors=True)
    eng.query("hello wor", "bm25", k=10)
"""

from probly_search_ray.build import build_index
from probly_search_ray.maintain import remove_document, vacuum
from probly_search_ray.refmodel import (
    BM25, RefIndex, ScoreCalculator, ZeroToOne)
from probly_search_ray.search import SearchEngine

__all__ = [
    "build_index", "SearchEngine", "remove_document", "vacuum",
    "ScoreCalculator", "BM25", "ZeroToOne", "RefIndex",
]
