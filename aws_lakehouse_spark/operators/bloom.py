"""Bloom-filter semi-join pruning (scale extension to SURVEY §2.3).

The 100 TB problem this solves: a fact-table semi join against a
filtered dimension key set. When the key set is small, ``broadcast()``
+ ``left_semi`` wins (``operators/joins.py``). When it is tens of
millions of keys, a broadcast HASH table no longer fits (~50 bytes/key
driver + per-executor), and the fallback — shuffling 100 TB of fact
rows on the join key — is the single most expensive exchange in the
plan. A Bloom filter needs ~1.2 bytes/key at 1% false positives, so
the key set that broke the hash broadcast still broadcasts as bits;
the fact scan drops ~99% of non-matching rows BEFORE any exchange,
and a final exact semi join (now over a tiny input) kills the false
positives. Spark's own runtime row-group filters
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) apply the same
idea automatically but only for shuffle-join pruning; this operator
makes the pattern explicit, tunable, and usable in front of ANY
downstream op (join, agg, write).

Mechanics — everything stays JVM-side / whole-stage-codegen:

- k hash functions are derived as ``xxhash64(key, i)`` for seed index
  i (hashing the (key, i) tuple — xxhash64's own seed is fixed in the
  SQL surface);
- the build side aggregates bit positions into 64-bit words with
  ``bit_or`` groupBy (map-side partial combine, shuffle of at most
  ``num_bits/64`` rows), then collects the word list to the driver —
  the same driver-sized aggregate Spark's runtime filter build does;
- the probe side evaluates ``element_at(lit(words), word_idx) & mask``
  per seed against the broadcast literal array — pure built-in
  expressions, no UDF, no Python in the hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _bit_mask(pos: Column) -> Column:
    """``1L << (pos % 64)`` with a Column shift amount — the
    DataFrame-API ``F.shiftleft`` only takes a literal int, so go
    through the SQL function registry (same JVM expression)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def build_bloom(
    keys: DataFrame, key_col: str, num_bits: int = 1 << 17, num_hashes: int = 3
) -> list[int]:
    """Aggregate the distinct ``key_col`` values of ``keys`` into a
    Bloom bitmap, returned as ``num_bits / 64`` little-endian words.

    One shuffle of at most ``num_bits/64 * num_hashes`` rows (the
    groupBy's map-side combine collapses everything else); the
    driver-side result is ``num_bits/8`` bytes regardless of key
    count — 2^27 bits = 16 MiB covers ~10^8 keys at ~1% fpp.
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    n_words = num_bits // 64
    positions = keys.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(num_bits))
                    for i in range(num_hashes)
                ]
            )
        ).alias("pos")
    )
    rows = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("word"),
            _bit_mask(F.col("pos")).alias("mask"),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for r in rows:
        words[r["word"]] = r["bits"]
    return words


def bloom_might_contain(
    key_col: Column | str, words: list[int], num_hashes: int = 3
) -> Column:
    """Membership-test Column over a :func:`build_bloom` bitmap —
    true for every present key, true with ~fpp probability for an
    absent one. Pure built-in expressions (xxhash64 / shiftleft /
    element_at on a literal array), so it inlines into the scan's
    whole-stage-codegen and runs BEFORE any exchange."""
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    num_bits = len(words) * 64
    arr = F.lit(words)
    cond = F.lit(True)
    for i in range(num_hashes):
        pos = F.pmod(F.xxhash64(col, F.lit(i)), F.lit(num_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + 1)
        cond = cond & (word.bitwiseAND(_bit_mask(pos)) != 0)
    return cond


def bloom_semi_join(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int = 1 << 17,
    num_hashes: int = 3,
    exact: bool = True,
) -> DataFrame:
    """Semi-join ``fact`` to ``keys``'s ``dim_key`` set with a Bloom
    pre-filter: probabilistic scan-side prune, then (``exact=True``)
    a residual ``left_semi`` join over the surviving ~matches to
    remove false positives. The residual join's input is already
    pruned to matches + fpp·|fact| rows, so its shuffle is a rounding
    error next to the full-fact shuffle it replaces; with ``exact=
    False`` the caller accepts the fpp (fine for sampling/stats)."""
    words = build_bloom(keys, dim_key, num_bits, num_hashes)
    pruned = fact.filter(bloom_might_contain(fact_key, words, num_hashes))
    if not exact:
        return pruned
    return pruned.join(
        keys.select(F.col(dim_key).alias(fact_key)).distinct(),
        on=fact_key,
        how="left_semi",
    )
