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
# Round-7 rotation: CORRECTNESS_r06 was 50/50 green (no reds to
# re-confirm), so positions 1-35 are exactly the 35 queries that have
# never appeared in any driver window (the r6 ROTATION NOTE pool: ANN
# variant tier, multimodal metadata/features, fulltext prefix/fuzzy/bm25,
# rel_cube/approx_percentiles, win_distribution, the graph
# path/traversal/lookup/similarity family, constraint check, and the
# articulation/bridges fast paths). Positions 36+ are the new round-7
# surfaces (registered as they land; _prioritized() skips unregistered
# names harmlessly). The previously-green r6 window follows as the tail.
#
# ROTATION NOTE (next round): if this window lands green, every
# registered query will have at least one driver-green row. Round 8
# should front-load any r7 reds, then the new r7 surfaces again if they
# missed the budget, then rotate oldest-evidence-first (r1 greens).
_PRIORITY: list[str] = [
    # (a) the 35 never-driver-sampled queries — ANN variant tier first
    "ann_lsh_buckets",
    "ann_lsh_multiprobe",
    "ann_binary_hamming",
    "ann_ivf_clusters",
    "ann_pq_search",
    "ann_sq_search",
    "ann_ivfpq_search",
    # multimodal remaining surfaces
    "multimodal_metadata",
    "multimodal_features",
    # fulltext variants
    "fulltext_prefix_search",
    "fulltext_fuzzy_search",
    "fulltext_bm25",
    # relational/window remainder
    "rel_cube",
    "rel_approx_percentiles",
    "win_distribution_functions",
    # graph lookup / traversal / path family
    "graph_find_nodes_by_label",
    "graph_find_edges_by_type",
    "graph_degrees",
    "graph_neighbors",
    "graph_neighbors_by_type",
    "graph_motif_pattern",
    "graph_bfs_levels",
    "graph_weighted_shortest_path",
    "graph_variable_paths",
    "graph_all_weighted_paths",
    "graph_closeness_sampled",
    # node-similarity variants
    "graph_adamic_adar",
    "graph_node_similarity_cosine",
    "graph_node_similarity_common",
    "graph_resource_allocation",
    "graph_preferential_attachment",
    "graph_most_similar",
    # graph constraints + driver-side fast-path tier
    "graph_constraint_check",
    "graph_articulation_points",
    "graph_bridges",
    # (b) new round-7 surfaces (registered as they land this round)
    "tx_atomic_visibility",
    "cursor_stream_batches",
    "result_cache_semantics",
    "graph_aggregate_verbs",
    "multimodal_mp4_frames",
    "ann_graph_rescore",
    "ann_graph_rescore_high_recall",
    "ann_graph_index_persist",
    "ann_graph_rescore_batch",
    # (c) previously-green r6 window (latest evidence r6) — tail
    "dml_graph_mutation",
    "dml_vector_mutation",
    "dml_entity_mutation",
    "fulltext_search",
    "rel_approx_distinct",
    "graph_scc_tarjan",
    "graph_mst_kruskal",
    "graph_astar_path",
    "graph_betweenness_sampled",
    "graph_louvain",
    "ddl_roundtrip",
    "cursor_pagination",
    "dml_fk_actions",
    "dml_constraint_enforcement",
    "dml_merge_partitioned",
    "stream_merge_upsert",
    "snapshot_roundtrip",
    "snapshot_wal_recover",
    "checkpoint_rollback",
    "unified_entity_stats",
    "unified_find_rows",
    "unified_similar_connected",
    "unified_neighbors_by_similarity",
    "cypher_match_edges",
    "cypher_node_match",
    "cypher_count_aggregate",
    "cypher_varlength_filtered",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_canonical",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_hot_ngrams",
    "dedup_semantic_semdedup",
    "pipeline_end_to_end",
    "ann_ivfpq_rescore",
    "ann_ivfpq_rescore_high_recall",
    "ann_ivfpq_rescore_low_scan",
    "ann_index_persist_roundtrip",
    "ann_pq_rescore",
    "ann_ivf_search",
    "multimodal_real_decode",
    "multimodal_image_dhash",
    "graph_bridges_distributed",
    "graph_articulation_distributed",
    "graph_scc_distributed",
    "graph_mst_boruvka",
    "graph_astar_distributed",
    "graph_core_decomposition",
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
    from neumann_spark.unified import entities  # noqa: F401
    from neumann_spark.pipeline import fulltext  # noqa: F401
    from neumann_spark.graph import queries, traversal  # noqa: F401
    from neumann_spark.graph import algorithms  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _import_all()
    return {n: _QUERIES[n] for n in _prioritized(_QUERIES)}


def all_oracles() -> dict[str, str]:
    _import_all()
    return {n: _ORACLES[n] for n in _prioritized(_QUERIES) if n in _ORACLES}
