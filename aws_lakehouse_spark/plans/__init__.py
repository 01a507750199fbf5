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
# ast import-graph taint map). The ROUND 8 window: 18 pins whose
# physical plans the r7 window-fusion/pin batch rewrote AFTER their
# last grade (events_funnel_steps .. ts_seasonal_decompose — all 18
# judge-verified at sf0.01 post-rewrite, now getting driver truth),
# 11 media_* pins touched by the r7 corrupt-payload NULL contract
# that lack an r7 row, then embed_pca_project (newly oracle-backed:
# projection onto the frozen literal fixture basis retires the
# registry's last rows-only entry — r7 verdict item 2; with its r8
# row the registry reaches 328/328 driver-hash-certified), then 20
# stalest r1 re-verifies padding the window. The --changed backlog
# beyond these (r1/r2 grades stale against six rounds of shared-
# module churn) drains stalest-first over coming rounds.
#
# Registry FROZEN at 328 since r5.
# `python tools/rotate_window.py --changed --apply` (run AFTER the
# driver writes CORRECTNESS_r08.json) computes the next window
# mechanically; update this comment with the round's rationale.
# Known r9 pin candidates already: snapshot_bloom_pruned_scan and
# snapshot_optimize_zorder changed AFTER this window was applied
# (the sf1 sweep's NDV-bloom fix + premise guard, both sf0.01- and
# sf1-parity-verified in-round) — --changed will pick them up.
_PRIORITY = [
    "events_funnel_steps",
    "events_funnel",
    "ts_anomaly_mad",
    "quality_entropy_profile",
    "events_cohort_retention",
    "events_retention",
    "agg_market_share_hhi",
    "agg_hll_intersection",
    "events_rolling_wau",
    "ts_autocorrelation",
    "events_ewma_trailing",
    "events_cusum_changepoint",
    "quality_ab_ttest",
    "events_time_to_convert",
    "ts_theil_sen_slope",
    "ann_ivf_topk",
    "dedup_incremental_minhash",
    "ts_seasonal_decompose",
    "media_audio_chunks",
    "media_audio_decode",
    "media_audio_silence",
    "media_extract_features",
    "media_frame_sample",
    "media_image_decode",
    "media_image_dhash",
    "media_image_histogram",
    "media_image_resize",
    "media_metadata",
    "media_resize_plan",
    "embed_pca_project",
    "join_fact_dim_zone",
    "join_range",
    "join_range_banded",
    "join_salted_skew",
    "join_semi",
    "limit_topk",
    "order_by_desc",
    "project_rename_cast",
    "rank_topk_per_group",
    "scalar_array_family",
    "scalar_calendar_dim_parts",
    "scalar_cast_types",
    "scalar_date_family",
    "scalar_derived_metrics",
    "scalar_isin_arith_normalize",
    "scalar_regex_extract",
    "scalar_regex_replace",
    "scalar_rlike_match",
    "scalar_string_family",
    "scalar_substring_split_trim",
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
