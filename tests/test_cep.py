"""CEP pattern-matcher tests: the streaming operator must equal an
independent sequential reference on the same data, across micro-batch
boundaries (state carries pending triggers between batches)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from aws_lakehouse_spark.catalog import load_table
from aws_lakehouse_spark.streaming.stateful import detect_pattern_per_key

WITHIN_US = 10 * 60 * 1_000_000


def _reference(rows):
    """Sequential consume-once matcher over (user, ts_us, type)."""
    out = []
    pending: dict[int, list[int]] = {}
    for user, t, etype in sorted(rows):
        if etype == "click":
            pending.setdefault(user, []).append(t)
        elif etype == "purchase":
            cand = pending.get(user, [])
            for i in range(len(cand) - 1, -1, -1):
                if 0 <= t - cand[i] <= WITHIN_US:
                    out.append((user, cand.pop(i), t))
                    break
    return set(out)


@pytest.fixture(scope="module")
def cep_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    return ev.select(
        "user_id",
        (F.unix_micros(F.col("ts").cast("timestamp"))).alias("ts_us"),
        "event_type",
    )


def test_cep_matches_sequential_reference(spark, cep_events, tmp_path):
    rows = [
        (r["user_id"], r["ts_us"], r["event_type"])
        for r in cep_events.collect()
    ]
    expect = _reference(rows)

    # stream the same events in 3 time-ordered file chunks so state
    # must carry pending clicks across micro-batches
    src = tmp_path / "src"
    src.mkdir()
    ordered = cep_events.orderBy("ts_us").collect()
    third = (len(ordered) + 2) // 3
    for i in range(3):
        chunk = ordered[i * third:(i + 1) * third]
        if chunk:
            spark.createDataFrame(
                chunk, "user_id bigint, ts_us bigint, event_type string"
            ).coalesce(1).write.mode("overwrite").parquet(
                str(src / f"chunk={i}")
            )
    stream = spark.readStream.schema(
        "user_id bigint, ts_us bigint, event_type string"
    ).option("maxFilesPerTrigger", "1").parquet(str(src / "chunk=*"))
    q = (
        detect_pattern_per_key(stream)
        .writeStream.format("memory")
        .queryName("cep_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["trigger_us"], r["action_us"])
        for r in spark.table("cep_test").collect()
    }
    assert got == expect
    assert len(got) > 0
    # latency column is consistent
    for r in spark.table("cep_test").collect():
        assert 0 <= r["latency_us"] <= WITHIN_US
        assert r["latency_us"] == r["action_us"] - r["trigger_us"]


def test_cep_consume_once_semantics(spark, tmp_path):
    """One trigger matches at most one action, newest trigger wins."""
    rows = [
        (1, 1_000_000, "click"),
        (1, 2_000_000, "click"),
        (1, 3_000_000, "purchase"),   # matches click@2s (newest)
        (1, 4_000_000, "purchase"),   # matches click@1s (remaining)
        (1, 5_000_000, "purchase"),   # no trigger left -> no match
        (2, 1_000_000, "purchase"),   # action before any trigger
        (2, 2_000_000, "click"),      # expires unmatched
    ]
    src = tmp_path / "one"
    spark.createDataFrame(
        rows, "user_id bigint, ts_us bigint, event_type string"
    ).coalesce(1).write.parquet(str(src))
    stream = spark.readStream.schema(
        "user_id bigint, ts_us bigint, event_type string"
    ).parquet(str(src))
    q = (
        detect_pattern_per_key(stream)
        .writeStream.format("memory")
        .queryName("cep_once")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["trigger_us"], r["action_us"])
        for r in spark.table("cep_once").collect()
    }
    assert got == {
        (1, 2_000_000, 3_000_000),
        (1, 1_000_000, 4_000_000),
    }
