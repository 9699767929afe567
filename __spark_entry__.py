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


# The driver evaluates queries() entries in registration order and may cap
# how many it runs per round; the engine's signature operators (index/BM25,
# snapshot reads, dedup, ANN, streaming, text analysis) are listed first so
# they always land inside the window, followed by a representative slice of
# the relational surface, then the remaining relational entries.
_PRIORITY = [
    # inverted-index / BM25 core (north rule)
    "bm25_topk_wand", "bm25_topk_wand_cold", "bm25_topk_auto",
    "bm25_topk_disjunctive", "bm25_topk_stopword", "bm25_topk_single",
    "bm25_conjunctive", "bm25_phrase",
    # round-5 additions: the never-driver-checked facet-filtered top-k
    # (registered after the r4 window was fixed) and the NEW positional-
    # postings phrase path (exact-phrase from index blocks alone)
    "bm25_topk_filtered", "bm25_phrase_positional",
    "index_term_stats", "index_doc_lengths", "index_postings_blocks",
    "facets_lang", "facets_top_terms", "latest_crawl_dedup",
    "index_snapshot_pinned", "index_snapshot_diff", "es_bulk_lines",
    # LLM-training-data pipeline operators
    "dedup_exact", "dedup_jaccard_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
    "dedup_embedding_cosine",
    "text_token_count", "text_token_count_bpe", "text_quality",
    "text_quality_filter", "doc_fingerprint", "text_langid",
    "multimodal_meta",
    # streaming surface
    "stream_tumbling_window", "stream_sliding_window", "stream_session_window",
    "stream_dedup", "stream_static_join",
    # relational slice — rotated each round, stalest-first, so every
    # registry entry gets a fresh driver row within a bounded number of
    # rounds (r2 ran scans/joins/aggs/windows; r3 ran set ops/UDx/pivot/
    # json; r4 ran outer/semi/theta joins, distinct aggs, window frames,
    # explode, fn_array/datetime/percentile). r5 rotates in the five
    # last-green-in-r1 scalar-function families plus the stalest r2
    # entries that fit after the two new bm25 rows above took their slots
    # (agg_tpch_q1/join_smj_fact are additionally executed by bench.py
    # every round; the rest of the r2 slice is byte-identical since r2).
    "fn_array_distinct", "fn_map", "fn_math", "fn_percentile_approx",
    "fn_string",
    "scan_project_filter", "join_asof_events", "join_broadcast_dims",
    "join_skew_salted", "agg_rollup", "win_topk_per_group",
]
assert len(_PRIORITY) == 50, len(_PRIORITY)  # driver runs exactly 50


def _registry():
    import engine.multimodal  # noqa: F401
    import engine.positional  # noqa: F401
    import engine.searchops  # noqa: F401
    import engine.simsearch  # noqa: F401
    import engine.streamingops  # noqa: F401
    import engine.textops  # noqa: F401
    from engine.relops import ORACLES, QUERIES

    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"priority entries not registered: {missing}"
    ordered = {n: QUERIES[n] for n in _PRIORITY}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    oracles = {n: ORACLES[n] for n in ordered if n in ORACLES}
    return ordered, oracles


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
