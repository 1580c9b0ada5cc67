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
# Round-8 rotation: CORRECTNESS_r07 was 50/50 green and the multi-round
# evidence program completed (176/176 registered queries driver-green at
# least once), so this round refreshes the STALEST evidence, per the r7
# ROTATION NOTE. Positions 1-4: the new round-8 surfaces (the NN-descent
# build is additionally covered because ann_graph_rescore* oracles replay
# it; `ann_graph_rescore` re-confirms one of them through the new build).
# Positions 5-33: the 29 queries whose latest green is round 1-3 (the
# relational spine, windows, PageRank/CC/LPA/eigenvector/triangles/
# k-core, Q1 + SQL-API form). Then the 3 r4-evidence joins, then the
# oldest 15 of the r5 tier (alphabetical prefix of that 50-query tier;
# the rest rotate in next round). Unlisted queries keep registration
# order after these.
#
# ROTATION NOTE (next round, r9): front-load any r8 reds, then the
# remaining ~35 r5-evidence queries not already rotated this round (the
# rest of the facade_*/geo_*/stream_*/text_*/vector_*/pipeline_*
# families — see CORRECTNESS history), then the r6 tier (distributed
# graph twins, Cypher, snapshots/DDL). The r8 surfaces
# (ann_graph_{filtered,stream_insert,cdc_stream}, hybrid_rrf_{search,ann},
# tx_wal_recover_abort, dml_merge_key_stability, the graph
# insert/delete/compact family) will then hold r8-green evidence and can
# drop to the back of the queue.
_PRIORITY: list[str] = [
    # (a) new round-8 surfaces — ordered for the session index cache:
    # the compact preset builds and caches the full graph index, so the
    # four queries after it are cache hits (seconds, not minutes); the
    # three subset-index builders (insert/stream/cdc) pay their own
    # build and go last so a tight driver budget still covers the rest
    "ann_graph_rescore_compact",
    "ann_graph_rescore",
    "ann_graph_filtered",
    "hybrid_rrf_ann",
    "ann_graph_delete_search",
    "hybrid_rrf_search",
    "tx_wal_recover_abort",
    "dml_merge_key_stability",
    "ann_graph_insert_search",
    "ann_graph_stream_insert",
    "ann_graph_cdc_stream",
    "ann_graph_insert_persist",
    # (b) r1-r3-evidence tier (stalest): relational spine
    "q1_pricing_summary",
    "sql_api_q1",
    "rel_scan_projection",
    "rel_filter_condition_tree",
    "rel_filter_expr_superset",
    "rel_count_star",
    "rel_agg_global",
    "rel_agg_group_having",
    "rel_agg_distinct",
    "rel_select_distinct",
    "rel_distinct_subset",
    "rel_rollup",
    "rel_pivot",
    "rel_percentiles",
    "rel_cast_types",
    "rel_json_extract",
    "rel_order_limit_offset",
    "rel_null_ordering",
    "rel_set_ops",
    "win_topk_per_group",
    "win_running_sum",
    "win_rank_lag",
    # r1-evidence graph algorithms
    "graph_pagerank",
    "graph_connected_components",
    "graph_label_propagation",
    "graph_eigenvector",
    "graph_triangle_count",
    "graph_kcore",
    "graph_node_similarity_jaccard",
    # (c) r4-evidence joins
    "join_multi_q5",
    "join_theta",
    "join_salted_skew",
    # (d) oldest 15 of the r5 tier (alphabetical; remainder next round)
    "dml_delete",
    "dml_update",
    "events_gap_fill",
    "facade_neighbors",
    "facade_path",
    "facade_similar",
    "geo_bbox_search",
    "geo_knn",
    "geo_radius_search",
    "graph_geo_distance",
    "join_anti",
    "join_cross",
    "join_full",
    "join_inner",
    "join_left",
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
