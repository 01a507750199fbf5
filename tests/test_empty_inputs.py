"""Empty-input robustness: at 100 TB an upstream filter, a stale
partition, or a first-run pipeline can hand ANY operator zero rows,
and the correct answer is an empty result — never a driver-side
IndexError/ZeroDivisionError or a degenerate-scenario assertion.

These are the 22 registry queries an all-tables-empty sweep
(tools/empty_sweep.py) crashed before round 5 hardened them:
numpy kernels stacking empty batches, PageRank dividing by a zero
node count, PQ codebook collects indexed without rows, snapshot-log
demos asserting on scenarios their empty input can't produce, and
partitioned write-then-read roundtrips that land no files. Each must
now return an empty (or trivially small) frame with its contract
schema."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
)

from aws_lakehouse_spark.registry import load_all

REGISTRY = load_all()

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# the pre-hardening crash list (tools/empty_sweep.py, round 5)
PREVIOUSLY_CRASHING = [
    "snapshot_bloom_pruned_scan",
    "snapshot_branch_merge",
    "snapshot_check_constraints",
    "snapshot_optimize_zorder",
    "snapshot_partition_evolution",
    "snapshot_rewrite_files",
    "snapshot_stats_pruned_scan",
    "snapshot_wap_publish",
    "graph_pagerank_topk",
    "ann_ivf_pq",
    "ann_product_quantization",
    "embed_pca_covariance",
    "ann_bruteforce_vectorized",
    "maintenance_compact_roundtrip",
    "snapshot_delete_update",
    "incremental_partition_recompute",
    "partition_pruned_roundtrip",
    "layout_zorder_pruned_scan",
    "join_dynamic_partition_pruning",
    "sink_dynamic_partition_overwrite",
    "streaming_cdc_upsert",
    "embed_pca_project",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    """Zero-row copies of every driver table, preserving the exact
    parquet physical types (duckdb round-trips TIMESTAMP_NS, which
    the events table needs for the nanosAsLong read path)."""
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = tmp_path_factory.mktemp("sf_empty")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
            f"LIMIT 0) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


@pytest.mark.parametrize("name", PREVIOUSLY_CRASHING)
def test_query_survives_empty_tables(name, spark, empty_sf_dir):
    df = REGISTRY[name].fn(spark, empty_sf_dir)
    # schema must still be the contract schema (column names intact),
    # and executing the plan must not raise
    assert df.columns, name
    assert df.count() >= 0, name


# the one-row boundary (tables truncated to a single row, referential
# integrity broken): the sweep crashed these 9 before hardening —
# scenario self-assertions whose preconditions (enough rows for a
# multi-file layout, a probe key/range present, both branch batches
# populated, non-degenerate variance) a single row cannot satisfy
ONE_ROW_PREVIOUSLY_CRASHING = [
    "snapshot_bloom_pruned_scan",
    "snapshot_branch_merge",
    "snapshot_optimize_zorder",
    "snapshot_stats_pruned_scan",
    "snapshot_wap_publish",
    "maintenance_compact_roundtrip",
    "layout_zorder_pruned_scan",
    "sink_dynamic_partition_overwrite",
    "agg_correlation_matrix",
]


@pytest.fixture(scope="module")
def one_row_sf_dir(tmp_path_factory):
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = tmp_path_factory.mktemp("sf_one")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
            f"LIMIT 1) TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


@pytest.mark.parametrize("name", ONE_ROW_PREVIOUSLY_CRASHING)
def test_query_survives_one_row_tables(name, spark, one_row_sf_dir):
    df = REGISTRY[name].fn(spark, one_row_sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name


def test_zorder_degenerate_layout_still_matches_oracle(
    spark, tmp_path
):
    """When the ingest layout already answers the probe box from <=1
    file, strict pruning improvement is uncertifiable — but the query
    must STILL return the pruned-scan aggregate (== oracle), not an
    empty frame (r9 advice: the r8 degenerate branch diverged from
    the oracle by construction whenever the box was one-file)."""
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    con = duckdb.connect()
    # one order, INSIDE the probe box (custkey 20-60, price 50k-150k):
    # the old branch returned [], the oracle one group
    con.execute(
        f"COPY (SELECT * REPLACE (CAST(30 AS BIGINT) AS o_custkey, "
        f"CAST(100000.0 AS DOUBLE) AS o_totalprice) FROM "
        f"read_parquet('{src}/orders.parquet') LIMIT 1) "
        f"TO '{tmp_path}/orders.parquet' (FORMAT PARQUET)"
    )
    spec = REGISTRY["snapshot_optimize_zorder"]
    got = spec.fn(spark, str(tmp_path)).collect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet')"
    )
    want = con.sql(spec.oracle).fetchall()
    con.close()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(got) == 1  # the non-degenerate answer, not []


# the null-heavy boundary (every column NULL except each table's
# first id column — a bad upstream extract): the sweep crashed these
# 5 before hardening — null embeddings reaching np.stack / float()
# in the ANN kernels, and scenario preconditions (constraint-clean
# batches, probe ranges) the nulled data cannot satisfy
NULL_HEAVY_PREVIOUSLY_CRASHING = [
    "snapshot_check_constraints",
    "snapshot_partition_evolution",
    "ann_ivf_pq",
    "ann_product_quantization",
    "ann_bruteforce_vectorized",
]


@pytest.fixture(scope="module")
def null_heavy_sf_dir(tmp_path_factory):
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    out = tmp_path_factory.mktemp("sf_nulls")
    con = duckdb.connect()
    for t in TABLES:
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()
        exprs = [
            f'"{name}"' if i == 0 else f'CAST(NULL AS {typ}) AS "{name}"'
            for i, (name, typ, *_rest) in enumerate(cols)
        ]
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM "
            f"read_parquet('{src}/{t}.parquet') LIMIT 200) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    con.close()
    return str(out)


@pytest.mark.parametrize("name", NULL_HEAVY_PREVIOUSLY_CRASHING)
def test_query_survives_null_heavy_tables(name, spark, null_heavy_sf_dir):
    df = REGISTRY[name].fn(spark, null_heavy_sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name


# the adversarial-zeros boundary (keys kept; every measure 0, text
# '', embeddings all-zero — tools/empty_sweep.py --zeros): under
# ANSI mode (the Spark 4 / driver-session default) double 0/0 and a
# CAST of '' both THROW, so any data-dependent ratio or cast needs a
# nullif / try_cast / try_parse_json guard. The sweep crashed these
# 4 before hardening (plus the zero-norm cosine class, locked
# separately in tests/test_semantic.py).
ZEROS_PREVIOUSLY_CRASHING = [
    "scalar_variant_json",       # parse_json('') was FAILFAST
    "events_anomaly_zscore",     # sigma=0 -> (v-mu)/0
    "quality_chisquare_drift",   # CAST('' AS BIGINT) on the cohort tag
    "agg_price_elasticity",      # price/quantity with quantity=0
    # representatives of the zero-norm cosine class (all-zero
    # embeddings flow through every ANN kernel without a crash)
    "ann_bruteforce_topk",
    "embed_semdedup",
]


@pytest.fixture(scope="module")
def zeros_sf_dir(tmp_path_factory):
    """Keys survive; every measure becomes its type's zero (numbers
    0, strings '', float arrays zero-vectors) — plans still join and
    group normally, but every ratio's denominator hits 0."""
    from empty_sweep import build_truncated_dir

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return build_truncated_dir(
        src, 200, zeros=True, out=str(tmp_path_factory.mktemp("sf_zeros"))
    )


@pytest.mark.parametrize("name", ZEROS_PREVIOUSLY_CRASHING)
def test_query_survives_zeroed_measures(name, spark, zeros_sf_dir):
    df = REGISTRY[name].fn(spark, zeros_sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name


# the replayed-batch boundary (--dup: every physical row appears
# twice, so primary keys collide — at-least-once ingest is the norm
# at scale, exactly-once a lie). The sweep crashed these 3 before
# hardening: PQ/IVFADC codebook collects returning [2K, d] arrays
# that break the [n, K] distance kernel, and the MERGE demo shipping
# a multi-row source key into the (correct, Delta-parity) duplicate-
# source guard — the fix is the standard CDC source key-dedup, not
# weakening the guard.
DUP_PREVIOUSLY_CRASHING = [
    "ann_product_quantization",
    "ann_ivf_pq",
    "snapshot_merge_into",
]


@pytest.fixture(scope="module")
def dup_sf_dir(tmp_path_factory):
    from empty_sweep import build_truncated_dir

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return build_truncated_dir(
        src, 200, dup=True, out=str(tmp_path_factory.mktemp("sf_dup"))
    )


@pytest.mark.parametrize("name", DUP_PREVIOUSLY_CRASHING)
def test_query_survives_replayed_batches(name, spark, dup_sf_dir):
    df = REGISTRY[name].fn(spark, dup_sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name


# the non-finite boundary (--extreme: NaN/+Inf/-Inf flood the float
# measures, float arrays go all-NaN — a corrupted export or a bad
# unit conversion). The sweep crashed these 4 before hardening: ANSI
# sessions throw ARITHMETIC_OVERFLOW casting non-finite doubles to
# integer types, hit by the integer-cent floor() in ABC
# classification, the decile floor in mode-per-group, and the
# Z-order quantizer (which clamped in LONG space, after the cast
# already threw). Fix pattern: scalar.finite() nulls non-finite
# measures before the cast; zorder_code clamps in double space.
EXTREME_PREVIOUSLY_CRASHING = [
    "agg_abc_classification",
    "agg_mode_per_group",
    "snapshot_optimize_zorder",
    "layout_zorder_pruned_scan",
]


@pytest.fixture(scope="module")
def extreme_sf_dir(tmp_path_factory):
    from empty_sweep import build_truncated_dir

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return build_truncated_dir(
        src, 200, extreme=True, out=str(tmp_path_factory.mktemp("sf_extreme"))
    )


@pytest.mark.parametrize("name", EXTREME_PREVIOUSLY_CRASHING)
def test_query_survives_nonfinite_measures(name, spark, extreme_sf_dir):
    df = REGISTRY[name].fn(spark, extreme_sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name


def test_zorder_code_places_nonfinite_at_edge_bins(spark):
    """The quantizer's documented contract on corrupt values: NaN and
    NULL share bin 0, -Inf clamps low, +Inf clamps high — and the
    Morton code never throws under an ANSI session."""
    from aws_lakehouse_spark.layout import zorder_code

    df = spark.createDataFrame(
        [(float("nan"),), (float("inf",),), (float("-inf"),), (None,), (5.0,)],
        "x double",
    )
    codes = [
        r["z"]
        for r in df.select(
            zorder_code({"x": (0.0, 10.0)}, bits=4).alias("z")
        ).collect()
    ]
    nan_c, pinf_c, ninf_c, null_c, mid_c = codes
    assert nan_c == null_c == ninf_c == 0
    assert pinf_c == 15
    assert 0 < mid_c < 15


# the hostile-text boundary (--unicode: astral emoji, RTL with
# combining marks, CJK with zero-width joiners appended to every
# string column — document sources and ids are arbitrary bytes in
# the wild). The sweep crashed 1 before hardening: DSIR's target-
# domain flag cast a source-tag suffix to BIGINT, which ANSI throws
# on for non-numeric text; now try_cast (NULL = non-target).
UNICODE_PREVIOUSLY_CRASHING = [
    "text_dsir_importance",
]


@pytest.fixture(scope="module")
def unicode_sf_dir(tmp_path_factory):
    from empty_sweep import build_truncated_dir

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return build_truncated_dir(
        src,
        200,
        unicode_=True,
        out=str(tmp_path_factory.mktemp("sf_unicode")),
    )


@pytest.mark.parametrize("name", UNICODE_PREVIOUSLY_CRASHING)
def test_query_survives_hostile_text(name, spark, unicode_sf_dir):
    df = REGISTRY[name].fn(spark, unicode_sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name


# the frozen-clock boundary (--frozen: every temporal column = the
# SAME instant — a pipeline stamping load-time instead of event-
# time). The round-7 sweep found ZERO crashes (the nullif/spine
# guards from earlier boundaries already cover zero-duration
# sessions and one-point spines); these representatives pin the
# riskiest shapes — duration-normalized rates, date spines, EWMA
# frames, session windows — so a future change can't regress the
# boundary silently between full sweeps.
FROZEN_REPRESENTATIVES = [
    "events_sessionize",
    "events_time_to_convert",
    "events_ewma_trailing",
    "events_gap_fill",
    "events_burstiness_fano",
]


@pytest.fixture(scope="module")
def frozen_sf_dir(tmp_path_factory):
    from empty_sweep import build_truncated_dir

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return build_truncated_dir(
        src, 200, frozen=True, out=str(tmp_path_factory.mktemp("sf_frozen"))
    )


@pytest.mark.parametrize("name", FROZEN_REPRESENTATIVES)
def test_query_survives_frozen_clock(name, spark, frozen_sf_dir):
    if name not in REGISTRY:
        pytest.skip(f"{name} not registered")
    df = REGISTRY[name].fn(spark, frozen_sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name


# the hot-key boundary (--hotkey: every foreign/grouping key = 1 —
# one customer places every order, one user emits every event, one
# mega-order holds all lineitems; the skew every 100 TB fact table
# has). The round-7 sweep found ZERO crashes; these representatives
# pin the riskiest shapes — single-group windows, per-entity
# collect/pair paths, star joins against one dim row, maximal-star
# graph kernels.
HOTKEY_REPRESENTATIVES = [
    "market_basket_rules",
    "events_top_paths",
    "graph_pagerank_topk",
    "agg_salted_skew",
    "rank_topk_per_group",
]


@pytest.fixture(scope="module")
def hotkey_sf_dir(tmp_path_factory):
    from empty_sweep import build_truncated_dir

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    return build_truncated_dir(
        src, 200, hotkey=True, out=str(tmp_path_factory.mktemp("sf_hotkey"))
    )


@pytest.mark.parametrize("name", HOTKEY_REPRESENTATIVES)
def test_query_survives_hot_keys(name, spark, hotkey_sf_dir):
    if name not in REGISTRY:
        pytest.skip(f"{name} not registered")
    df = REGISTRY[name].fn(spark, hotkey_sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name
