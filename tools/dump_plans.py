"""Generate docs/PLANS.md: the formatted physical plan of each headline
query with a one-line commentary on the scale-relevant properties
(pushdown, broadcast, partial agg, top-k). Re-run after plan-affecting
changes: python tools/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

COMMENTARY = {
    "q1_pricing_summary": "Single scan; timestamp filter pushed to parquet; "
    "partial+final HashAggregate pair (map-side combine); tiny sort.",
    "join_multi_q5": "lineitem⋈orders is the only large join; customer/"
    "supplier/nation/region all BroadcastHashJoin — the fact table never "
    "shuffles for dims.",
    "rel_scan_projection": "PushedFilters + 4-column ReadSchema: scan reads "
    "only what the query needs.",
    "rel_count_star": "ReadSchema struct<> — COUNT(*) answered from parquet "
    "metadata, zero data pages.",
    "vector_knn_cosine": "Map-only scoring + TakeOrderedAndProject: "
    "per-partition top-k then driver merge, no shuffle.",
    "join_semi": "LeftSemi broadcast join — EXISTS without row duplication.",
    "join_salted_skew": "Salted join: hot keys split across 8 sub-keys; "
    "replicated broadcast dim.",
    "stream_tumbling_window": "window() partial agg before shuffle; same plan "
    "runs under readStream with watermark state eviction.",
    "graph_most_similar": "Dynamic anchor is a broadcast 1-row aggregate; "
    "candidate generation is a broadcast semi-join on the anchor's supplier "
    "set — no all-pairs stage; TakeOrderedAndProject top-k.",
    "graph_node_similarity_cosine": "Pair generation blocked by shared "
    "supplier (equi-join), partial+final agg; degree joins broadcast.",
    "dml_vector_mutation": "Anti-join delete + union upsert collapse into "
    "one scan; exact decimal agg partial+final.",
    "graph_triangle_count": "Degree-oriented edge orientation before the "
    "wedge join bounds fan-out on skewed hubs.",
    "graph_pagerank": "Power iteration compiles to ONE job of chained "
    "shuffles (join on src, groupBy dst per round); the static "
    "no-in-degree node set unions in shuffle-free — no per-round restore "
    "join.",
    "geo_knn": "Haversine is a pure column expression; "
    "TakeOrderedAndProject top-k, no range-partitioned sort.",
    "rel_cube": "CUBE = one Expand + one partial/final agg pair — a single "
    "shuffle for all 2^k grouping sets.",
    "win_distribution_functions": "NTILE/PERCENT_RANK/CUME_DIST share one "
    "window shuffle+sort.",
    "source_csv_roundtrip": "Schema'd CSV read — no inference scan; "
    "splittable line reader parallelizes per block.",
    "pipeline_decontaminate": "Corpus-side n-gram stream joins a "
    "BroadcastExchange of the (small) eval-set grams — map-only on the "
    "corpus side, then one partial/final count agg.",
    "events_gap_fill": "Spine (days x types) is broadcast; fact rollup is "
    "a partial/final agg; LOCF one window keyed by type.",
    "unified_similar_connected": "Bounded-BFS reachable set broadcasts "
    "BELOW the cosine projection — at scale the dot product touches only "
    "reachable vectors, never the corpus; TakeOrderedAndProject top-k.",
    "ann_ivfpq_rescore": "Stage 1 filters by a STATIC probe IN-list "
    "(prunes list files on a cluster-partitioned index) and ADC-scores "
    "8-byte PQ codes; stage 2 broadcast-semi-joins the shortlist so full "
    "vectors are read for shortlist rows only.",
    "dedup_semantic_semdedup": "Pair join is blocked on the learned "
    "k-means cluster id (the shuffle key) — no corpus-wide pair stage; "
    "removal accounting is one distinct + one left join.",
    "multimodal_real_decode": "Two Arrow mapInPandas stages (encode, "
    "decode) over a doc_id-only scan; batches stream — no partition "
    "materialization, no driver collect.",
    "rel_approx_percentiles": "GK sketch = bounded mergeable partial agg "
    "state (objHashAggregate) — per-group quantiles without a full sort.",
    "ann_ivfpq_rescore_low_scan": "Two-stage ANN at a 0.1 scan budget: "
    "fine-PQ ADC shortlist over broadcast code maps, broadcast 200-row "
    "shortlist semi-join, exact cosine rescore, TakeOrdered top-k — the "
    "float vectors are read for 10% of the corpus only.",
    "multimodal_image_dhash": "Arrow mapInPandas over the encoded media "
    "column: one scan, no shuffle; the dHash stage streams batches and "
    "emits two-int fingerprints — the image-dedup blocking key.",
    "pipeline_end_to_end": "Composed curation chain: three semi/anti "
    "joins (quality gate, dedup survivors, decontamination) against one "
    "documents scan, then a single groupBy — the stages fuse instead of "
    "re-scanning per step.",
    "ann_graph_rescore": "Graph-index search, final stage plan: the "
    "round loop probes the edge table by a broadcast B-row frontier and "
    "ADC-joins a broadcast (s, code, d) LUT per round (bounded frames "
    "only); here the ADC-top-100 shortlist broadcast-semi-joins the "
    "vectors for the exact rescore + TakeOrdered top-k — full vectors "
    "are read for 5% of the corpus.",
    "multimodal_mp4_frames": "One Arrow mapInPandas stage over a "
    "doc_id-only scan: encode raw-track MP4s and demux them back through "
    "the stsd/stsz/stsc/stco walk, one row per frame — no shuffle, no "
    "driver collect.",
    "ann_graph_rescore_compact": "Compact graph-ANN preset, final stage "
    "plan: the ADC-top-150 shortlist broadcast-joins the 64 B SQ8 code "
    "rows (never the 512 B float vectors); dequantization is a codegen'd "
    "array expression over the frozen [lo, hi]/255 grid literals, then "
    "TakeOrdered top-k — the rescore reads 1/8 the bytes of the exact "
    "presets at equal shortlist coverage.",
    "ann_graph_insert_search": "Search through an incrementally-grown "
    "index: identical probe shape to ann_graph_rescore (broadcast "
    "frontier IN-list edge probe + broadcast-LUT ADC join per round) — "
    "the insert path contributes only bulk equi-joins upstream (seeded "
    "candidates, one refinement hop, bounded re-selection on affected "
    "nodes), so the search plan is indistinguishable from the "
    "batch-built index's.",
    "hybrid_rrf_search": "Each retrieval leg ends in its own "
    "TakeOrderedAndProject top-50 (BM25: one doc_id shuffle off the "
    "broadcast term-list inverted-index join; cosine: map-only score), "
    "rank windows run over the 50-row collected legs, and the RRF "
    "fusion is a full-outer merge of two top-K frames (Spark plans "
    "full-outer as sort-merge; both inputs are <= 50 rows, so its "
    "exchange moves ~100 rows — negligible next to either leg).",
    "hybrid_rrf_ann": "The serving-path hybrid: the vector leg is the "
    "graph index's round-synchronous search (broadcast frontier IN-list "
    "edge probes + broadcast-LUT ADC joins, exact rescore of a 100-row "
    "shortlist), so the fusion's vector input is 10 rows; the BM25 leg "
    "and sort-merge fusion are identical to hybrid_rrf_search.",
    "ann_graph_filtered": "Identical probe shape to ann_graph_rescore; "
    "the label filter joins the shortlist stage as a broadcast "
    "(filtered-DiskANN post-filter strategy), so traversal plans and "
    "edge-file pruning are unchanged and the filter costs one broadcast "
    "hash join over the evaluated-candidate set.",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from neumann_spark.registry import all_queries
    from neumann_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = all_queries()
    out = [
        "# Physical plans — headline queries",
        "",
        f"Generated by `python tools/dump_plans.py {sf_dir}` "
        "(re-run after plan-affecting changes). Commentary notes the "
        "scale-relevant plan properties the implementation is designed for.",
        "",
    ]
    jvm = spark._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    for name, note in COMMENTARY.items():
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        out.append(f"## {name}\n\n{note}\n\n```\n{plan.strip()}\n```\n")
    with open("/root/repo/docs/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(COMMENTARY)} plans)")


if __name__ == "__main__":
    main()
