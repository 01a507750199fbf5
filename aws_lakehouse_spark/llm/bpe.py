"""Distributed BPE tokenizer training (byte-pair encoding, Sennrich
et al. 2016 — the subword vocabulary construction every modern LLM
pipeline runs over its curated corpus).

Scale shape — the part that matters at 100 TB: the corpus is scanned
EXACTLY ONCE, collapsing to a (word, count) frequency table that is
VOCABULARY-sized (~10⁵-10⁷ rows regardless of corpus bytes); every
merge iteration then runs over that table only — one pair-count
aggregate (map-side combined, weighted by word frequency) plus one
symbol-sequence rewrite, each a vocabulary-sized job. The driver
holds nothing but the winning pair per round (a 2-string scalar),
and per-round lazy ``localCheckpoint`` keeps the plan tree flat
(same discipline as connected components, ``llm/dedup.py``).

Merge semantics match the reference implementation: per round, the
globally most frequent adjacent symbol pair (ties broken
lexicographically — deterministic across engines and partitionings)
is replaced left-to-right and NON-OVERLAPPING in every word, with
simultaneous-pass semantics: a symbol produced by a merge this round
never re-merges as the LEFT side within the same round (the fold
carries a just-merged flag to enforce it).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """ONE corpus scan → (word, count). Everything downstream of BPE
    training touches only this vocabulary-sized frame."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs in a sequence."""
    n = F.size(syms)
    idx = F.sequence(F.lit(1), F.greatest(n - 1, F.lit(0)))
    return F.when(n < 2, F.array()).otherwise(
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(syms, i).alias("a"),
                F.element_at(syms, i + 1).alias("b"),
            ),
        )
    )


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """Replace adjacent (a, b) with a||b, left-to-right,
    non-overlapping, simultaneous-pass semantics via a fold carrying
    (out, just_merged)."""
    merged = F.lit(a + b)
    init = F.struct(
        F.expr("array()").cast("array<string>").alias("out"),
        F.lit(False).alias("jm"),
    )

    def step(acc: Column, x: Column) -> Column:
        can_merge = (
            (F.size(acc["out"]) > 0)
            & ~acc["jm"]
            & (F.element_at(acc["out"], -1) == F.lit(a))
            & (x == F.lit(b))
        )
        return F.when(
            can_merge,
            F.struct(
                F.concat(
                    F.slice(acc["out"], 1, F.size(acc["out"]) - 1),
                    F.array(merged),
                ).alias("out"),
                F.lit(True).alias("jm"),
            ),
        ).otherwise(
            F.struct(
                F.concat(acc["out"], F.array(x)).alias("out"),
                F.lit(False).alias("jm"),
            )
        )

    return F.aggregate(syms, init, step, lambda acc: acc["out"])


def bpe_train(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_pair_count: int = 2,
) -> list[dict]:
    """Learn ``n_merges`` BPE merge rules over the corpus.

    Returns the ordered merge table: one dict per round with
    ``{"rank", "left", "right", "pair_count"}`` — the artifact a
    tokenizer ships. Stops early when no pair reaches
    ``min_pair_count``.
    """
    vocab = word_frequency_table(docs, text_col)
    seqs = vocab.select(
        "count", F.split("word", "").alias("syms")
    ).localCheckpoint(eager=False)

    merges: list[dict] = []
    for rank in range(n_merges):
        best = (
            seqs.select(
                "count", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
            )
            .groupBy("p")
            .agg(F.sum("count").alias("n"))
            # deterministic winner: max count, then lexicographic pair
            .orderBy(F.desc("n"), F.asc("p.a"), F.asc("p.b"))
            .first()
        )
        if best is None or best["n"] < min_pair_count:
            break
        a, b = best["p"]["a"], best["p"]["b"]
        merges.append(
            {"rank": rank, "left": a, "right": b, "pair_count": best["n"]}
        )
        seqs = seqs.withColumn(
            "syms", _merge_pair(F.col("syms"), a, b)
        ).localCheckpoint(eager=False)
    return merges


def bpe_apply(
    docs: DataFrame,
    merges: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a learned merge table: per doc,
    per word, apply the merge rules in rank order. Pure scan-side
    column expressions — the hot tokenize path stays in the JVM."""
    out = docs.select(
        F.col(id_col),
        F.transform(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != ""),
            lambda w: F.split(w, ""),
        ).alias("__words"),
    )
    def rule(a: str, b: str):
        # closure factory, NOT default-arg capture: PySpark inspects
        # lambda arity, and `lambda x, a=a: ...` silently becomes the
        # (element, index) binary form binding a to the index
        def apply_one(syms: Column) -> Column:
            return _merge_pair(syms, a, b)

        return apply_one

    col = F.col("__words")
    for m in merges:
        col = F.transform(col, rule(m["left"], m["right"]))
    return out.select(
        F.col(id_col),
        F.flatten(col).alias("tokens"),
        F.size(F.flatten(col)).cast("int").alias("n_tokens"),
    )
