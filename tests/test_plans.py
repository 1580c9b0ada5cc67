"""Physical-plan assertions: the optimizations we claim must be visible in
`.explain()` output — predicate pushdown into the parquet scan, column
pruning, broadcast joins for small dims, partial aggregation, and top-k
(TakeOrdered) instead of full sorts. These are the Spark analogs of the
reference's hand-built fast paths (SURVEY.md §4 table)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _plan(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_filter_pushdown_and_pruning(spark):
    from neumann_spark.operators.relational import rel_scan_projection

    plan = _plan(rel_scan_projection(spark, SF_DIR))
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)" in plan
    # projection pruned to the 4 selected columns at the scan
    assert "l_tax" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_small_dim_broadcasts(spark):
    from neumann_spark.operators.joins import join_inner

    plan = _plan(join_inner(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan


def test_q1_partial_aggregation(spark):
    from neumann_spark.operators.relational import q1_pricing_summary

    plan = _plan(q1_pricing_summary(spark, SF_DIR))
    # partial (map-side) + final agg pair
    assert plan.count("HashAggregate") >= 2
    assert "PushedFilters" in plan


def test_knn_uses_take_ordered(spark):
    from neumann_spark.functions.vector import knn
    from neumann_spark.catalog import load

    emb = load(spark, SF_DIR, "embeddings")
    df = knn(emb, "embedding", [0.0] * 64, 5, "cosine")
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan


def test_count_star_metadata_only(spark):
    from neumann_spark.operators.relational import rel_count_star

    plan = _plan(rel_count_star(spark, SF_DIR))
    # COUNT(*) over parquet: scan reads zero columns (ReadSchema is empty struct)
    assert "ReadSchema: struct<>" in plan


def test_semi_join_physical(spark):
    from neumann_spark.operators.joins import join_semi

    plan = _plan(join_semi(spark, SF_DIR))
    assert "LeftSemi" in plan


def test_most_similar_broadcasts_anchor(spark):
    """The dynamic anchor and its supplier set must broadcast — candidate
    generation is a broadcast semi-ish join, never an all-pairs shuffle —
    and top-k must be TakeOrderedAndProject, not a global sort."""
    from neumann_spark.graph.algorithms import graph_most_similar

    plan = _plan(graph_most_similar(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_similarity_pair_join_has_partial_agg(spark):
    """Shared-supplier pair generation aggregates with a partial+final
    HashAggregate pair (map-side combine before the (a,b) shuffle)."""
    from neumann_spark.graph.algorithms import graph_node_similarity_cosine

    plan = _plan(graph_node_similarity_cosine(spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_triangle_count_no_cartesian(spark):
    from neumann_spark.graph.algorithms import graph_triangle_count

    plan = _plan(graph_triangle_count(spark, SF_DIR))
    assert "CartesianProduct" not in plan


def test_geo_knn_take_ordered(spark):
    from neumann_spark.functions.geo import geo_knn

    plan = _plan(geo_knn(spark, SF_DIR))
    # nearest-k is per-partition top-k + k-row merge, never a full sort
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_geo_bbox_is_map_only(spark):
    from neumann_spark.functions.geo import geo_bbox_search

    plan = _plan(geo_bbox_search(spark, SF_DIR))
    # pure predicate: no shuffle anywhere in the plan
    assert "Exchange" not in plan


def test_cube_single_shuffle(spark):
    from neumann_spark.operators.relational import rel_cube

    plan = _plan(rel_cube(spark, SF_DIR))
    # CUBE expands in one Expand + partial/final agg pair — one shuffle
    assert "Expand" in plan
    assert plan.count(") Exchange") == 1 and "hashpartitioning" in plan


def test_similar_connected_filters_before_scoring(spark):
    """`unified_similar_connected` must push the (tiny, bounded-BFS)
    reachability semi-join BELOW the cosine projection — the reference's
    pre-filter strategy at <10% selectivity (`vector_engine/src/lib.rs:
    387-399`). In the physical tree the scoring Project is therefore a
    parent of the broadcast reach join: at 100 TB the dot product runs
    over only reachable vectors, never the full corpus."""
    from neumann_spark.unified.entities import unified_similar_connected

    df = unified_similar_connected(spark, SF_DIR)
    lines = df._jdf.queryExecution().executedPlan().toString().splitlines()
    score_i = next(i for i, l in enumerate(lines) if "zip_with" in l)
    join_i = next(
        i for i, l in enumerate(lines)
        if "BroadcastHashJoin" in l and "node" in l
    )
    assert score_i < join_i  # scoring sits above (after) the reach join


def test_ivfpq_rescore_broadcasts_shortlist(spark):
    """The production two-stage ANN config: probe filter and shortlist are
    broadcast joins (never a shuffle of the embeddings), final top-k is
    TakeOrdered, and nothing degenerates to a cartesian product."""
    from neumann_spark.pipeline.ann import ann_ivfpq_rescore

    plan = _plan(ann_ivfpq_rescore(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_distribution_windows_single_shuffle(spark):
    from neumann_spark.operators.windows import win_distribution_functions

    plan = _plan(win_distribution_functions(spark, SF_DIR))
    # all three distribution functions share one window shuffle+sort
    assert plan.count(") Exchange") == 1 and "hashpartitioning" in plan
    assert ") Window" in plan


def test_persisted_index_search_prunes_partitions(spark, tmp_path):
    """A search through the persisted index must read ONLY the probed
    cluster partitions: probe selection is a driver-side argsort over the
    k-row centroid list pushed as a static IN-list, so the scan carries
    PartitionFilters over the cluster-partitioned layout (at 100 TB this
    skips (k - nprobe)/k of the index files at the source)."""
    from neumann_spark.catalog import load
    from neumann_spark.pipeline.ann import (
        ANN_RESCORE_NPROBE,
        _ivfpq_rescore_search,
        load_ann_index,
        save_ann_index,
    )

    path = str(tmp_path / "annidx")
    save_ann_index(spark, SF_DIR, path)
    assign, centroids, codes, codebooks = load_ann_index(spark, path)
    emb = load(spark, SF_DIR, "embeddings")
    plan = _plan(
        _ivfpq_rescore_search(emb, assign, centroids, codes, codebooks))
    # formatted mode: the scan's detail block carries its own
    # PartitionFilters line
    scan = next(
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "cluster" in ln)
    assert " IN (" in scan
    n_in = scan.split(" IN (")[1].split(")")[0].count(",") + 1
    assert n_in == ANN_RESCORE_NPROBE


def test_persisted_graph_edges_prune_partitions(spark, tmp_path):
    """Each graph-search round probes <= B source nodes; on the persisted
    block-partitioned edge layout the frontier's literal block IN-list
    must surface as PartitionFilters, so a round reads only its probed
    edge files (at 100 TB: B files of N/GRAPH_EDGE_BLOCKS each, never the
    whole edge table)."""
    from neumann_spark.pipeline.ann import (
        GRAPH_C,
        GRAPH_EDGE_BLOCKS,
        load_graph_index,
        save_graph_index,
    )

    path = str(tmp_path / "gidx")
    save_graph_index(spark, SF_DIR, path)
    edges, *_ = load_graph_index(spark, path)
    frontier = [0, 3, 7]  # a round's collected B-int frontier
    blocks = sorted({v % GRAPH_EDGE_BLOCKS for v in frontier})
    probe = edges.filter(
        F.col("src").isin(frontier) & (F.col("pos") < GRAPH_C)
    ).filter(F.col("block").isin(blocks))
    plan = _plan(probe)
    scan = next(
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "block" in ln)
    assert " IN (" in scan
    n_in = scan.split(" IN (")[1].split(")")[0].count(",") + 1
    assert n_in == len(blocks)


def test_merge_touched_partition_read_prunes(spark, tmp_path):
    """MERGE INTO's read of the target must carry PartitionFilters over
    the touched-partition IN-list — at scale the scan never lists or
    reads untouched partition directories."""
    from pyspark.sql import functions as F

    tdir = str(tmp_path / "mt")
    spark.createDataFrame(
        [(i, ["a", "b", "c", "d"][i % 4], float(i)) for i in range(20)],
        "k bigint, p string, v double",
    ).write.partitionBy("p").parquet(tdir)
    from neumann_spark.operators.dml import _pruned_target_read

    touched = ["a", "c"]
    # plan the EXACT frame merge_into_partitioned reads, not a re-built one
    plan = _plan(_pruned_target_read(spark, tdir, "p", touched))
    scan = next(
        ln for ln in plan.splitlines()
        if "PartitionFilters" in ln and "p#" in ln)
    assert " IN (" in scan
    n_in = scan.split(" IN (")[1].split(")")[0].count(",") + 1
    assert n_in == len(touched)


def test_hybrid_legs_take_ordered_fusion_tiny(spark):
    """Both hybrid retrieval legs must end in TakeOrderedAndProject
    (per-partition top-K + driver merge — never a global sort of the
    corpus), the rank windows must run over the top-K frames (below the
    TakeOrdered, not over the corpus), and the final fused top-10 is
    itself a TakeOrdered."""
    from neumann_spark.unified.hybrid import hybrid_rrf_search

    plan = _plan(hybrid_rrf_search(spark, SF_DIR))
    # two leg top-Ks + the fused top-10
    assert plan.count("TakeOrderedAndProject") >= 3
    # fusion is a full-outer of two K-row frames; the corpus-sized scans
    # sit below the TakeOrdereds, so no Exchange moves corpus-scale rows
    # after them — Window appears above TakeOrdered in both legs
    assert "Window" in plan


def test_graph_filtered_broadcasts_allow_list(spark):
    """`ann_graph_filtered`'s label filter must join the shortlist stage
    as a BROADCAST (the filtered-DiskANN post-filter) — the traversal
    plan itself is unchanged, so vs the unfiltered same-preset search the
    filtered plan must add EXACTLY ONE BroadcastHashJoin (the allow-list
    semi against the bounded evald frame), with evald on the broadcast
    (build) side. Counting against the unfiltered twin pins the property
    even though every graph plan already contains broadcast joins."""
    from neumann_spark.pipeline.ann import (
        ann_graph_filtered,
        ann_graph_rescore_high_recall,
    )

    import re

    # same-preset twin: ann_graph_filtered serves at the high-recall
    # auto preset since r10
    base = _plan(ann_graph_rescore_high_recall(spark, SF_DIR))
    plan = _plan(ann_graph_filtered(spark, SF_DIR))

    def n_joins(p: str, kind: str) -> int:
        # formatted plans print each join twice (tree arm + detail
        # header); count the numbered detail headers only
        return len(re.findall(rf"\(\d+\) {kind}\b", p))

    n_base = n_joins(base, "BroadcastHashJoin")
    n_filt = n_joins(plan, "BroadcastHashJoin")
    assert n_filt == n_base + 1, (n_base, n_filt)
    # the extra join must not be a nested-loop or sort-merge degradation
    assert n_joins(plan, "SortMergeJoin") == n_joins(base, "SortMergeJoin")
    assert n_joins(plan, "BroadcastNestedLoopJoin") == n_joins(
        base, "BroadcastNestedLoopJoin")


def test_hybrid_connected_semi_joins_below_both_legs(spark):
    """`hybrid_rrf_connected` must apply the reachability allow-set as
    BROADCAST LEFT-SEMI joins in BOTH scoring legs, below their top-Ks:
    two LeftSemi broadcast joins (keyword + vector leg), and the leg
    top-Ks + fused top-10 all TakeOrderedAndProject. A LeftSemi above the
    top-K is impossible in this shape (the fusion is a full-outer of two
    rank frames), so the counts pin the pre-filter placement."""
    import re

    from neumann_spark.unified.hybrid import hybrid_rrf_connected

    plan = _plan(hybrid_rrf_connected(spark, SF_DIR))
    semis = re.findall(r"BroadcastHashJoin .*LeftSemi", plan)
    assert len(semis) == 2, semis
    assert len(re.findall(r"\(\d+\) TakeOrderedAndProject", plan)) >= 3


def test_filtered_auto_tight_takes_brute_path(spark):
    """`ann_filtered_auto_tight` (~6% selective) must dispatch to the
    exact brute pre-filter scan: the plan is scan → filter → score →
    TakeOrderedAndProject with NO joins at all — any join node means the
    dispatch wrongly routed to the graph index."""
    import re

    from neumann_spark.pipeline.ann import ann_filtered_auto_tight

    plan = _plan(ann_filtered_auto_tight(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan
    assert not re.search(r"\(\d+\) \w*Join", plan), "unexpected join node"
    assert re.search(r"\(\d+\) Filter", plan)


def test_batch_probe_join_form_is_hash_join(spark, tmp_path):
    """The batched search's edge probe in BOTH regimes (VERDICT r9 item
    6): below GRAPH_PROBE_INLIST_MAX the literal src IN-list prunes at
    the scan; above it the IN-list comes off and the frontier join must
    still plan as a BroadcastHashJoin on the src equi-key — never a
    BroadcastNestedLoopJoin (the trap: a constant-folded join key turns
    BHJ into BNLJ). Block partition pruning stays literal in both
    regimes (≤ GRAPH_EDGE_BLOCKS values by construction)."""
    import re

    from neumann_spark.pipeline.ann import (
        GRAPH_C,
        GRAPH_EDGE_BLOCKS,
        load_graph_index,
        save_graph_index,
    )

    path = str(tmp_path / "gidx_joinform")
    save_graph_index(spark, SF_DIR, path)
    edges, *_ = load_graph_index(spark, path)
    fr_pairs = [(q, v) for q in range(8) for v in range(q, q + 8)]
    srcs = sorted({v for _, v in fr_pairs})
    fr_df = spark.createDataFrame(fr_pairs, "qid bigint, src bigint")
    blocks = sorted({v % GRAPH_EDGE_BLOCKS for v in srcs})

    for with_inlist in (True, False):
        probe = edges.filter(F.col("pos") < GRAPH_C)
        if with_inlist:
            probe = probe.filter(F.col("src").isin(srcs))
        probe = probe.filter(F.col("block").isin(blocks))
        joined = probe.join(F.broadcast(fr_df), "src")
        plan = _plan(joined)
        assert re.search(r"\(\d+\) BroadcastHashJoin", plan), plan[-800:]
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
        scan = next(ln for ln in plan.splitlines()
                    if "PartitionFilters" in ln and "block" in ln)
        # Catalyst renders long literal lists as INSET, short ones as IN
        assert (" IN (" in scan) or (" INSET " in scan), scan


def test_local_df_one_slice_and_empty_local_relation(spark):
    """The driver-local batch helpers (§5): `local_df` must carry a handful
    of statement rows in ONE partition (plain createDataFrame spreads them
    over defaultParallelism — 32 no-op tasks per action on every mutation
    chain), produce values/schema identical to createDataFrame, and
    `empty_df` must be a true LocalRelation so PropagateEmptyRelation can
    prune it out of the overlay union chains entirely."""
    from neumann_spark.session import empty_df, local_df

    rows = [(1, "a", [1.0, 2.0]), (2, None, [3.0])]
    schema = "id bigint, s string, v array<double>"
    ours = local_df(spark, rows, schema)
    ref = spark.createDataFrame(rows, schema)
    assert ours.rdd.getNumPartitions() == 1
    assert ref.rdd.getNumPartitions() > 1  # the cost local_df removes
    assert ours.schema == ref.schema
    assert sorted(map(tuple, ours.collect())) == sorted(map(tuple, ref.collect()))

    # empty frame: zero partitions, pruned from a union at optimize time
    emp = emp0 = empty_df(spark, schema)
    assert emp.schema == ref.schema
    assert emp.count() == 0
    assert emp.rdd.getNumPartitions() == 0
    unioned = emp.unionAll(ref).unionAll(emp0)
    opt = unioned._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in opt, opt  # both empty legs pruned
