#!/usr/bin/env python
"""Benchmark runner for the driver (BENCH_r{N}.json producer).

Runs the engine's headline queries (the ``bench=True`` registry
entries: cleanse filter, as-of join, event windows, the flagship
star-revenue query, dedup, token counting, similarity search) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE compact JSON line:

    {"metric": "headline_total", "value": <sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

The line is kept to exactly those keys so it fits the driver's
bounded output-tail capture (round 5's line, grown to ~4 KB by
stddev + canaries, came back ``parsed: null``). Per-trial samples,
stddev, GC-robust trimmed means, and the host-speed canaries land in
``BENCH_DETAIL.json`` next to this script.

Each query executes its full physical plan into the no-op sink —
real scan/shuffle/compute work, nothing collected to the driver.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from aws_lakehouse_spark.registry import load_all  # noqa: E402
from aws_lakehouse_spark.session import get_spark  # noqa: E402


def _calibrate_cpu() -> float:
    """Host-speed canary: best-of-5 single-thread 512x512 float64
    matmul, in seconds. Query timings on this shared host drift
    1.2-2x with external load (measured round 5: the same kernel,
    same code, same sf ran 2.2 s and 4.4 s twenty minutes apart), so
    cross-round comparisons need a denominator that tracks the host,
    not the engine. Pure numpy, no Spark involvement."""
    import numpy as np

    rng = np.random.default_rng(0)
    a = rng.standard_normal((512, 512))
    b = rng.standard_normal((512, 512))
    a @ b  # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        a @ b
        best = min(best, time.perf_counter() - t0)
    return round(best, 5)


def run() -> dict:
    calib = _calibrate_cpu()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    registry = load_all()
    headline = {n: s for n, s in registry.items() if s.bench}

    spark = get_spark(
        "bench",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={
            # test tables are single small parquet files; with the
            # 128 MB production split size every scan is ONE task.
            # 1 MB splits spread the scan across cores — the local
            # stand-in for the many-file layout a real table has.
            "spark.sql.files.maxPartitionBytes": str(1 * 1024 * 1024),
            "spark.sql.files.openCostInBytes": str(64 * 1024),
        },
    )
    # JVM/codegen/file-index warmup; not timed
    for t in ("region", "lineitem", "orders", "events", "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()

    # second host canary, MULTI-threaded through the real engine: the
    # single-thread matmul (calib_cpu_sec) missed a run where every
    # query inflated ~25% while the matmul held steady — whatever
    # throttles 32-thread JVM work (CPU steal, scheduler contention)
    # doesn't show on one pinned core. A fixed synthetic Spark job
    # (no I/O, pure codegen arithmetic across all cores) tracks the
    # engine's actual execution conditions; best-of-3.
    calib_spark = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 50_000_000, 1, int(cpus)).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).collect()
        calib_spark = min(calib_spark, time.perf_counter() - t0)
    calib_spark = round(calib_spark, 4)

    # third canary, ENGINE-shaped (parquet scan + hash-agg shuffle +
    # collect): r8 measured a regime where calib_spark IMPROVED 18%
    # while the identical committed query set ran ~25% slower — I/O
    # and shuffle live outside pure codegen, so a probe that includes
    # them tracks the dimension the other two miss. Fixed shape over
    # the bench's own lineitem table (comparable only at equal sf).
    # Since r9 this canary is the gate's code-vs-environment
    # DISCRIMINATOR for uniform median shifts (see _normalized_gate).
    calib_engine = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").groupBy(
            "l_returnflag", "l_linestatus"
        ).agg({"l_extendedprice": "sum", "l_quantity": "avg"}).collect()
        calib_engine = min(calib_engine, time.perf_counter() - t0)
    calib_engine = round(calib_engine, 4)

    # n>=5 trials per query: with n=2 a ±50% swing is unreadable
    # (round-2 lesson); best-of-n stays the headline number (first
    # run pays codegen compile, spikes are host-load noise), stddev
    # over the warm trials (all but the first) quantifies that noise.
    # Pinned plans (localCheckpoint kernels) are GC-BIMODAL: one
    # outlier trial can double the mean, so the detail file also
    # carries a trimmed mean (warm trials minus the single worst) —
    # the statistic to trust when stddev rivals the mean.
    trials = int(os.environ.get("SPARK_GRAFT_TRIALS", "5"))
    # noisy queries (the checkpointed streaming drains are the worst:
    # idle-host warm trials sit at ~2.3 s ±14%, but under host load
    # single trials spread 3.9-10 s) get EXTRA trials until the warm
    # stddev drops under 30% of the warm mean or the retry budget runs
    # out — min/trimmed-mean converge with n, so adaptive sampling
    # shrinks exactly the numbers the round-over-round comparison reads
    max_extra = int(os.environ.get("SPARK_GRAFT_MAX_EXTRA_TRIALS", "4"))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    trimmed: dict[str, float] = {}
    raw: dict[str, list[float]] = {}

    def _warm_stats(samples: list[float]) -> tuple[float, float]:
        warm = samples[1:] or samples
        mean = sum(warm) / len(warm)
        sd = (sum((s - mean) ** 2 for s in warm) / len(warm)) ** 0.5
        return mean, sd

    for name, spec in headline.items():
        samples: list[float] = []
        for _ in range(trials):
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        mean, sd = _warm_stats(samples)
        extra = 0
        while mean > 0 and sd / mean > 0.30 and extra < max_extra:
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            mean, sd = _warm_stats(samples)
            extra += 1
        warm = samples[1:] or samples
        timings[name] = round(min(samples), 3)
        spreads[name] = round(sd, 3)
        trim = sorted(warm)[:-1] or warm
        trimmed[name] = round(sum(trim) / len(trim), 3)
        raw[name] = [round(s, 3) for s in samples]
        # isolation between queries: drop any cache a query left
        # behind and nudge the JVM to release trial localCheckpoint
        # RDDs now, so query N's leftovers can't inflate query N+1
        # (GC spikes of 2-3x observed when checkpoints accumulate)
        spark.catalog.clearCache()
        try:  # py4j-only hint; never let hygiene kill the bench
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    spark.stop()
    # The driver machine-reads ONLY the final stdout line, through a
    # bounded output-tail capture that truncated round 5's ~4 KB line
    # (BENCH_r05.json came back parsed:null). The headline line
    # therefore carries exactly the driver-contract keys (~1 KB for
    # 32 queries); everything else — per-trial samples, stddev,
    # trimmed means, host canaries — goes to the sidecar.
    headline_line = {
        "metric": "headline_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    detail = {
        **headline_line,
        "trials": trials,
        "stddev": spreads,
        # warm trials minus the single worst: robust to the one-GC-
        # spike bimodality of pinned plans (round-5 verdict item 4)
        "trimmed_mean": trimmed,
        "samples": raw,
        # host-speed canaries: calib_cpu_sec is a pinned single-thread
        # matmul; calib_spark_sec is a fixed all-cores synthetic Spark
        # job (see above — it tracks throttling the matmul misses).
        # Normalize cross-round comparisons by calib_spark_sec first.
        "calib_cpu_sec": calib,
        "calib_spark_sec": calib_spark,
        "calib_engine_sec": calib_engine,
        # pre-normalized per-query and total ratios (value /
        # calib_spark_sec): the number a cross-round comparison should
        # read FIRST — r6's "regression" was the host running 1.57x
        # slower at bench time, visible only through the canary
        "normalized": {
            n: round(v / calib_spark, 2) for n, v in timings.items()
        },
        "headline_normalized": round(
            sum(timings.values()) / calib_spark, 2
        ),
    }
    detail["normalized_gate"] = _normalized_gate(detail)
    return headline_line, detail


def _normalized_gate(detail: dict, base: dict | None = None) -> dict:
    """Round-over-round comparison in CANARY-NORMALIZED units (r7
    verdict item 8): wall seconds on this shared host drift 1.2-2x
    with external load (r6's published numbers were 1.57x
    load-inflated), so the gate reads value/calib_spark_sec ratios
    against the committed accepted-round baseline
    (``BENCH_NORMALIZED_BASELINE.json``) instead of seconds.

    The canary tracks CPU-regime drift but not every environment
    dimension: measured r8, a host whose calib_spark IMPROVED 18%
    ran the identical committed query set ~25% slower in wall time
    (I/O / scheduler regime the pure-codegen canary can't see), so
    raw ratio-vs-baseline flagged phantom regressions across the
    board (median ratio 1.46, zero outliers). A CODE regression is a
    per-query effect; an ENVIRONMENT shift moves the whole
    distribution. The gate therefore self-normalizes by the MEDIAN
    ratio over the common set: a query regresses when its ratio
    exceeds 1.5x the median AND it grew by more than 1.0 canary unit
    (the absolute floor keeps sub-canary queries' jitter out).
    ``median_ratio`` itself is reported — and since r9 a uniform
    shift (>1.15x median) is no longer shrugged off as environment:
    the engine-shaped canary attributes it (``uniform_shift_verdict``
    below — code / environment / mixed), and a "code" or "mixed"
    verdict FAILS the gate. The result rides in the sidecar."""
    if base is None:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_NORMALIZED_BASELINE.json",
        )
        if not os.path.exists(path):
            return {"pass": True, "reason": "no committed baseline"}
        base = json.load(open(path))
    base_norm = base.get("normalized", {})
    now_norm = detail["normalized"]
    common = sorted(n for n in now_norm if base_norm.get(n))
    if not common:
        return {"pass": True, "reason": "no common queries with baseline"}
    ratios = {n: round(now_norm[n] / base_norm[n], 2) for n in common}
    srt = sorted(ratios.values())
    mid = len(srt) // 2
    median_ratio = (
        srt[mid] if len(srt) % 2 else (srt[mid - 1] + srt[mid]) / 2
    )
    regressions = {
        n: r
        for n, r in ratios.items()
        if r > 1.5 * median_ratio and (now_norm[n] - base_norm[n]) > 1.0
    }
    base_total = sum(base_norm[n] for n in common)
    now_total = sum(now_norm[n] for n in common)
    total_ratio = round(now_total / base_total, 3) if base_total else 1.0

    # Three-way verdict on a UNIFORM median shift (r8 verdict item 2):
    # self-normalizing by the median is right for environment drift,
    # but a real regression that hits every query equally would read
    # as "environment" too. The discriminator is the ENGINE-shaped
    # canary (parquet scan + hash-agg shuffle + collect) — identical
    # committed code every round, normalized by calib_spark like the
    # queries: when the median moves and the engine canary moved WITH
    # it, the I/O/shuffle regime moved ("environment"); when the
    # canary held while the queries moved, the code did ("code" —
    # gate FAILS); in between, "mixed" (gate FAILS — forces a look).
    verdict = "none"
    engine_ratio = None
    base_eng = base.get("calib_engine_sec")
    now_eng = detail.get("calib_engine_sec")
    if base_eng and now_eng and base.get("calib_spark_sec"):
        engine_ratio = round(
            (now_eng / detail["calib_spark_sec"])
            / (base_eng / base["calib_spark_sec"]),
            3,
        )
    if median_ratio > 1.15:
        if engine_ratio is None:
            verdict = "unattributable"  # pre-engine-canary baseline
        else:
            explained = (engine_ratio - 1.0) / (median_ratio - 1.0)
            if explained >= 0.5:
                verdict = "environment"
            elif explained <= 0.25:
                verdict = "code"
            else:
                verdict = "mixed"
    return {
        "baseline_round": base.get("round"),
        "common_queries": len(common),
        "median_ratio": round(median_ratio, 3),
        "regime_shift": not (0.75 <= median_ratio <= 1.33),
        "engine_canary_ratio": engine_ratio,
        "uniform_shift_verdict": verdict,
        "total_ratio": total_ratio,
        "per_query_ratio": ratios,
        "regressions": regressions,
        "pass": not regressions and verdict not in ("code", "mixed"),
    }


if __name__ == "__main__":
    headline_line, detail = run()
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(sidecar, "w") as fh:
        json.dump(detail, fh, indent=1)
    print(f"detail (stddev / trimmed means / samples / canaries): {sidecar}")
    gate = detail.get("normalized_gate", {})
    print(
        "normalized gate vs r%s baseline: %s (median_ratio=%s%s, "
        "engine_canary_ratio=%s, uniform_shift_verdict=%s, "
        "total_ratio=%s, regressions=%s)"
        % (
            gate.get("baseline_round"),
            "PASS" if gate.get("pass") else "FAIL",
            gate.get("median_ratio"),
            " REGIME-SHIFT" if gate.get("regime_shift") else "",
            gate.get("engine_canary_ratio"),
            gate.get("uniform_shift_verdict"),
            gate.get("total_ratio"),
            sorted(gate.get("regressions", {})),
        )
    )
    print(json.dumps(headline_line))
