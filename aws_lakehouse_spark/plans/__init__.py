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
# the registry dict. Coverage debt closed at r7 (every registry query
# driver-green at least once), so from ROUND 8 on the window enforces
# the STANDING RULE from the r7 verdict: a query whose plan changed
# after its last green grade re-enters the next window as a re-verify
# pin (`tools/rotate_window.py --changed` derives the list from the
# git diff against each query's last-grade driver commit, through the
# fingerprint taint, tools/code_fingerprint.py since r10). The ROUND
# 11 window applies the rotation r10 computed but never landed (r10
# verdict item 2): the 50 stalest fingerprint-changed grades —
# tpch_q4..q9 (r2-era), the r3 text/embed kernels, the r4 agg/
# snapshot/streaming faces, the r5 graph/snapshot rows — pinned
# stalest-last-green-round first. 21 further changed grades did not
# fit and are DEFERRED to r12 (list in the r11 round notes; also
# reprinted by any `rotate_window.py --changed` run). Overlap with
# the r10 window: 0/50 — every driver slot this round buys fresh
# evidence. Head-of-tree cover for the un-graded remainder stays the
# committed full-registry parity artifacts (PARITY_SF001_r11.txt,
# PARITY_SF1_r11.txt).
#
# Registry FROZEN at 328 since r5.
# `python tools/rotate_window.py --changed --apply` (run at round
# START, after the driver writes CORRECTNESS_r{N-1}.json) computes
# the next window mechanically; tools/artifact_check.py fails at
# round close if _PRIORITY[:50] still equals the last graded key set
# (the r10 fumble, made mechanical). Update this comment with each
# round's rationale.
_PRIORITY = [
    "tpch_q4_order_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "ann_quantize_int8",
    "dedup_incremental_exact",
    "embed_cluster_assign",
    "embed_semdedup",
    "events_attribution",
    "snapshot_time_travel_diff",
    "text_bigram_lm_score",
    "text_bigram_rarity",
    "text_char_entropy",
    "text_decontaminate",
    "text_repetition_score",
    "text_tfidf_topk",
    "text_vocab_topk",
    "text_winnow_fingerprint",
    "agg_approx_count_distinct",
    "agg_histogram_equidepth",
    "agg_mode_per_group",
    "agg_weighted_median",
    "ann_embedding_neardup",
    "dedup_containment",
    "dedup_lsh_quality",
    "embed_outliers",
    "events_growth_accounting",
    "join_interval_overlap",
    "maintenance_compact_roundtrip",
    "partition_pruned_roundtrip",
    "scalar_variant_json",
    "snapshot_delete_update",
    "snapshot_merge_into",
    "snapshot_schema_evolution",
    "source_python_datasource",
    "streaming_cdc_upsert",
    "text_curation_pipeline",
    "ann_hybrid_rrf",
    "ann_ivf_pq",
    "ann_recall_eval",
    "dedup_incremental_bloom",
    "embed_kmeans_iteration",
    "graph_connected_components",
    "graph_label_propagation",
    "graph_pagerank_topk",
    "rag_index_pipeline",
    "snapshot_bloom_pruned_scan",
    "snapshot_branch_merge",
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
