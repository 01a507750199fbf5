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
# ast import-graph taint map). The ROUND 9 window is pure backlog
# drain (r8 verdict item 1): 50 of the 278 taint-stale grades,
# stalest last-green round first — the r1/r2-graded queries whose
# shared modules (operators/joins.py, plans/core.py, llm/*) have
# churned across six rounds. Head-of-tree evidence for the OTHER 278
# lives in the committed full-registry sf0.01 parity artifact
# (PARITY_SF001_r09.txt, engine/oracle walls split per query) — the
# standing per-round artifact that bridges grades while windows
# rotate; the deferred list prints at rotation time and carries to
# r10.
#
# Registry FROZEN at 328 since r5.
# `python tools/rotate_window.py --changed --apply` (run AFTER the
# driver writes CORRECTNESS_r09.json) computes the next window
# mechanically; update this comment with the round's rationale.
_PRIORITY = [
    "scalar_to_date_fmt",
    "scalar_when_otherwise_map",
    "scan_parquet",
    "set_except",
    "set_intersect",
    "set_union_by_name",
    "window_lag_lead",
    "window_rank_family",
    "window_running_frames",
    "ann_bruteforce_topk",
    "ann_bruteforce_vectorized",
    "ann_lsh_bucketed",
    "ann_lsh_multiprobe",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_minhash_signature",
    "dedup_near_duplicate_resolution",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "events_anomaly_zscore",
    "events_dedup_within_time",
    "events_session_window",
    "events_sessionize",
    "events_sliding_window",
    "events_tumbling_window",
    "medallion_gold_fact",
    "medallion_noaa_cleanse",
    "medallion_star_revenue",
    "text_corpus_prep",
    "text_fingerprint",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "tpch_q10_returned_items",
    "tpch_q11_important_stock",
    "tpch_q12_priority_counts",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_counts",
    "tpch_q17_small_quantity",
    "tpch_q18_large_volume_customer",
    "tpch_q19_disjunctive",
    "tpch_q1_pricing_summary",
    "tpch_q20_excess_suppliers",
    "tpch_q21_waiting_suppliers",
    "tpch_q22_global_sales",
    "tpch_q2_min_cost_supplier",
    "tpch_q3_shipping_priority",
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
