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
# Round-10 rotation (per the r9 ROTATION NOTE): there are no r9 reds,
# so positions 1-3 are the new round-10 surfaces (the auto-budget
# serving queries — persisted-meta round-trip + derived knobs, single
# and batched forms, VERDICT r9 item 2 — and the versioned BM25 CDC
# stats churn/redelivery surface).
# Then the ENTIRE remaining r6-evidence tier (44 queries: the ANN
# IVF/persist family, cypher_*, ddl/dml constraint surfaces, the dedup
# family, the distributed graph twins + driver-side fast paths,
# multimodal, snapshots/WAL, stream_merge_upsert, and the unified
# entity family — everything last driver-green in round 6) fills the
# ~50-query driver budget. After this round the evidence floor rises
# to r7.
#
# ROTATION NOTE (next round, r11): front-load any r10 reds, then the
# r7 tier (the 49 names whose newest driver evidence is r7:
# ann_binary_hamming/lsh*/pq*/sq/ivfpq_search, graph CRUD/degrees/
# neighbors/traversals/similarity, fulltext_*, facade surfaces,
# cursor_stream_batches, approx aggregates, multimodal stubs — pick
# the oldest 49 by the CORRECTNESS_r* union), then the r8 names in
# r12.
_PRIORITY: list[str] = [
    # (a) new round-10 surfaces
    "ann_graph_rescore_auto",
    "ann_graph_batch_auto",
    "fulltext_bm25_cdc_stats",
    # (b) the full r6-evidence tier (alphabetical)
    "ann_index_persist_roundtrip",
    "ann_ivf_search",
    "ann_ivfpq_rescore",
    "ann_ivfpq_rescore_high_recall",
    "ann_ivfpq_rescore_low_scan",
    "ann_pq_rescore",
    "checkpoint_rollback",
    "cursor_pagination",
    "cypher_count_aggregate",
    "cypher_match_edges",
    "cypher_node_match",
    "cypher_varlength_filtered",
    "ddl_roundtrip",
    "dedup_cluster_canonical",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_hot_ngrams",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_semantic_semdedup",
    "dedup_simhash",
    "dml_constraint_enforcement",
    "dml_fk_actions",
    "dml_merge_partitioned",
    "graph_articulation_distributed",
    "graph_astar_distributed",
    "graph_astar_path",
    "graph_betweenness_sampled",
    "graph_bridges_distributed",
    "graph_core_decomposition",
    "graph_louvain",
    "graph_mst_boruvka",
    "graph_mst_kruskal",
    "graph_scc_distributed",
    "multimodal_image_dhash",
    "multimodal_real_decode",
    "pipeline_end_to_end",
    "snapshot_roundtrip",
    "snapshot_wal_recover",
    "stream_merge_upsert",
    "unified_entity_stats",
    "unified_find_rows",
    "unified_neighbors_by_similarity",
    "unified_similar_connected",
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
