"""Central registry of (query, oracle) pairs — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers:
  * a callable (spark, sf_dir) -> DataFrame   — the Spark-first implementation
  * optionally an ANSI-SQL string DuckDB can run on the same parquet views
    (order-insensitive value-hash comparison; column names must match).

Queries whose semantics aren't SQL-expressible (approximate ANN, sampled
algorithms) register without an oracle → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# Driver-evidence priority order. The correctness driver checks queries in
# the order `queries()` yields them, under a fixed budget (empirically the
# first ~50). Registration order is module-import order (cheapest modules
# first), so without this list the same cheap window would be re-sampled
# every round. Each round the list is rotated toward never-driver-sampled
# queries; queries not listed keep their registration order after these.
#
# Round-12 rotation (per the r11 ROTATION NOTE): there are no r11 reds,
# so the head is the ENTIRE r8-evidence tier — the 50 names whose
# newest driver evidence is r8 by the CORRECTNESS_r* union (relational
# core, joins incl. the Q5 flagship, windows, set ops, facade surfaces,
# the ann_graph serve/insert/delete/stream/churn family, hybrid RRF,
# graph algorithm suite, snapshot/tx pins) — exactly filling the ~50
# driver budget so the evidence floor rises to r9. Position 51 is
# ann_graph_autobudget_law: its surface CHANGED this round (the
# nnd_rounds build-depth column + the 262K/524K ladder points), so it
# re-queues immediately behind the tier (it is selfcheck-verified at
# both SFs this round either way).
#
# ROTATION NOTE (next round, r13): front-load any r12 reds, then
# ann_graph_autobudget_law if r12's budget cut before it, then the
# 47-name r9 tier (newest evidence r9 by the CORRECTNESS_r* union:
# text_* pipeline queries, geo, vector brute/filtered kNN family,
# CSV/JSON/ORC sinks, curation ×4, joins inner/left/right/full/cross/
# natural/semi/anti, asof, streaming windows), then the r10 names in
# r14.
_PRIORITY: list[str] = [
    # (a) the full r8-evidence tier (alphabetical)
    "ann_graph_cdc_stream",
    "ann_graph_delete_search",
    "ann_graph_filtered",
    "ann_graph_insert_persist",
    "ann_graph_insert_search",
    "ann_graph_rescore",
    "ann_graph_rescore_compact",
    "ann_graph_stream_insert",
    "dml_delete",
    "dml_merge_key_stability",
    "dml_update",
    "events_gap_fill",
    "facade_neighbors",
    "facade_path",
    "facade_similar",
    "graph_connected_components",
    "graph_eigenvector",
    "graph_kcore",
    "graph_label_propagation",
    "graph_node_similarity_jaccard",
    "graph_pagerank",
    "graph_triangle_count",
    "hybrid_rrf_ann",
    "hybrid_rrf_search",
    "join_multi_q5",
    "join_salted_skew",
    "join_theta",
    "q1_pricing_summary",
    "rel_agg_distinct",
    "rel_agg_global",
    "rel_agg_group_having",
    "rel_cast_types",
    "rel_count_star",
    "rel_distinct_subset",
    "rel_filter_condition_tree",
    "rel_filter_expr_superset",
    "rel_json_extract",
    "rel_null_ordering",
    "rel_order_limit_offset",
    "rel_percentiles",
    "rel_pivot",
    "rel_rollup",
    "rel_scan_projection",
    "rel_select_distinct",
    "rel_set_ops",
    "sql_api_q1",
    "tx_wal_recover_abort",
    "win_rank_lag",
    "win_running_sum",
    "win_topk_per_group",
    # (b) changed-this-round surface, immediately behind the tier
    "ann_graph_autobudget_law",
]


def _prioritized(names: dict[str, object]) -> list[str]:
    """Order query names: _PRIORITY entries first, then registration order."""
    listed = [n for n in _PRIORITY if n in names]
    rest = [n for n in names if n not in set(_PRIORITY)]
    return listed + rest


def _import_all() -> None:
    """Import every query-bearing module (side effect: registration).

    Order = driver execution order, cheapest modules first: the driver's
    correctness budget should cover as many queries as possible before it
    reaches the iterative graph algorithms, which dominate wall-time at
    fixture scale (per-job overhead, not data volume)."""
    from neumann_spark.pipeline import curation, text_queries  # noqa: F401
    from neumann_spark.sources import formats  # noqa: F401
    from neumann_spark.functions import geo, vector  # noqa: F401
    from neumann_spark.streaming import windows as stream_windows  # noqa: F401
    from neumann_spark.operators import asof, dml, facade, joins, mutations, relational, windows  # noqa: F401
    from neumann_spark.pipeline import ann, dedup, multimodal  # noqa: F401
    from neumann_spark.unified import entities, hybrid  # noqa: F401
    from neumann_spark.pipeline import fulltext  # noqa: F401
    from neumann_spark.graph import queries, traversal  # noqa: F401
    from neumann_spark.graph import algorithms  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _import_all()
    return {n: _QUERIES[n] for n in _prioritized(_QUERIES)}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {n: _ORACLES[n] for n in _prioritized(_QUERIES) if n in _ORACLES}
