"""The engine's registered query surface.

Importing this package populates :data:`aws_lakehouse_spark.registry.
REGISTRY` with every declared query: the SURVEY §2 operator inventory
(core relational + scalar functions + event-time windows), the
medallion pipeline queries, and the LLM training-data extensions
(dedup / similarity / text analysis / multimodal).
"""

from aws_lakehouse_spark.plans import (  # noqa: F401
    core,
    core_ext,
    formats,
    scalar,
    events_windows,
    medallion,
    sql_surface,
    stats,
    timeseries,
    quality,
    drift,
    geo,
    tpch,
    tpch2,
    tpch3,
    graph,
    llm_text,
    behavior,
    retrieval,
    llm_dedup,
    llm_similarity,
    llm_semantic,
    multimodal,
)

from aws_lakehouse_spark.registry import REGISTRY

# The driver's correctness gate grades exactly the FIRST 50 entries of
# the registry dict. Cumulative r1-r4 banked green rows for 197 of the
# 328 registered queries; 131 oracle-backed queries have never had a
# driver row (all 131 are judge-green in JUDGE_ORACLE_r4). The ROUND 5
# window below follows the r4 verdict's explicit prioritization: the 14
# ungraded snapshot_* faces, the graph tier, ts_*/window_*, sql_*
# (recursive CTE / lateral / pipe syntax / parameterized), the r4
# retrieval additions (IVF-PQ, PQ/ADC, recall eval, BM25, hybrid RRF),
# then 9 high-traffic LLM-pipeline fills (RAG index, BPE encode, DSIR,
# span-dedup apply, JSD, curriculum, incremental bloom dedup, k-means
# iterate, PCA covariance). Previously-green queries follow (rows
# banked); rows-only specs (oracle=None, e.g. embed_pca_project) stay
# dead last and never enter the graded window.
#
# Registry growth stays FROZEN (r4 verdict item 2) until the debt
# clears: 131 -> 81 -> 31 -> 0 over r5-r7. Rounds 6 and 7 rotate onto
# the remaining 81 in alphabetical order (agg_abc_classification ..
# media_image_neardup for r6; media_scene_cuts .. udaf_grouped_geomean
# for r7). `python tools/rotate_window.py --apply` (run AFTER the
# driver writes CORRECTNESS_r05.json) computes and rewrites the next
# window mechanically; update this comment with the round's rationale.
_PRIORITY = [
    "snapshot_bloom_pruned_scan",
    "snapshot_branch_merge",
    "snapshot_check_constraints",
    "snapshot_clone_shallow",
    "snapshot_history_table",
    "snapshot_incremental_scan",
    "snapshot_optimize_zorder",
    "snapshot_partition_evolution",
    "snapshot_rewrite_files",
    "snapshot_rollback_restore",
    "snapshot_segmented_manifest",
    "snapshot_stats_pruned_scan",
    "snapshot_tagged_read",
    "snapshot_wap_publish",
    "graph_adamic_adar",
    "graph_bfs_distance",
    "graph_connected_components",
    "graph_degree_distribution",
    "graph_label_propagation",
    "graph_pagerank_topk",
    "graph_triangle_count",
    "ts_anomaly_mad",
    "ts_autocorrelation",
    "ts_gap_fill",
    "ts_linear_trend",
    "ts_seasonal_decompose",
    "ts_theil_sen_slope",
    "window_cumulative_distinct",
    "window_ntile_deciles",
    "window_percent_rank_cume",
    "window_period_over_period",
    "window_range_interval_frame",
    "sql_lateral_topk",
    "sql_parameterized_query",
    "sql_pipe_syntax",
    "sql_recursive_cte",
    "ann_ivf_pq",
    "ann_product_quantization",
    "ann_recall_eval",
    "text_bm25_topk",
    "ann_hybrid_rrf",
    "rag_index_pipeline",
    "text_bpe_encode",
    "text_dsir_importance",
    "text_span_dedup_apply",
    "text_jsd_langs",
    "text_curriculum_order",
    "dedup_incremental_bloom",
    "embed_kmeans_iteration",
    "embed_pca_covariance",
    # --- index 50 boundary: the graded window ends here ---
]


def _reorder() -> None:
    ordered = {}
    for name in _PRIORITY:
        spec = REGISTRY.get(name)
        if spec is None:  # pragma: no cover - priority list drift
            raise KeyError(f"_PRIORITY names unknown query: {name}")
        if spec.oracle is None:  # pragma: no cover
            raise ValueError(f"_PRIORITY entry lacks an oracle: {name}")
        ordered[name] = spec
    # remaining oracle-backed queries, in registration order
    for name, spec in REGISTRY.items():
        if name not in ordered and spec.oracle is not None:
            ordered[name] = spec
    # rows-only specs dead last — outside any graded window
    for name, spec in REGISTRY.items():
        if name not in ordered:
            ordered[name] = spec
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder()

__all__ = ["REGISTRY"]
