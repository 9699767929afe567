"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``engine/`` (SURVEY.md §7); importing the op
modules populates the shared registry in ``engine.relops``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _registry():
    import engine.multimodal  # noqa: F401
    import engine.searchops  # noqa: F401
    import engine.simsearch  # noqa: F401
    import engine.streamingops  # noqa: F401
    import engine.textops  # noqa: F401
    from engine.relops import ORACLES, QUERIES

    return QUERIES, ORACLES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: build the inverted index over sf0.001 webpages and answer a
    BM25 top-10 query (SURVEY.md §3.2/§3.3)."""
    from engine.query import query_topk
    from engine.searchops import get_index

    handle = get_index(spark, "/root/testdata/sf0.001")
    return query_topk(spark, handle, "spark join", k=10, mode="wand")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _registry()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    _, o = _registry()
    return dict(o)
