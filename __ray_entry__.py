"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline (documents → inverted index →
BM25 search) at sf0.001; ``queries()`` exposes every implemented
operator/pipeline from SURVEY.md §2 plus the training-data ops;
``oracle_sql()`` gives the DuckDB-checkable subset.

Ray is initialised by the driver before import — nothing here calls
``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: build the inverted index over sf0.001 documents and run
    a BM25 top-10 search through the sharded engine."""
    from probly_search_ray.pipelines.queries import _engine
    eng = _engine("/root/testdata/sf0.001")
    import pandas as pd
    res = eng.query("table merge stream", "bm25", k=10)
    return pd.DataFrame({"doc_id": [int(d) for d, _ in res],
                         "score": [float(s) for _, s in res]})


def queries() -> dict[str, Callable[[str], Any]]:
    from probly_search_ray.pipelines.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from probly_search_ray.pipelines.queries import ORACLES
    return dict(ORACLES)
