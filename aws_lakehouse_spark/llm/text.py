"""Text-analysis operators for training-data curation.

All pure Column expressions over ``documents.text`` — whole-stage
codegen end-to-end, no Python in the hot path. At 100 TB these run
as a single scan+project with no shuffle.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column

# Deterministic mini stopword profiles for the language-ID heuristic.
# Real deployments would load per-language n-gram tables; the scoring
# machinery (per-language token-hit ratio → argmax) is the operator.
LANGUAGE_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "value", "row", "table", "fast"),
    "fr": ("le", "la", "valeur", "ligne", "table", "vite"),
    "de": ("der", "die", "wert", "zeile", "tabelle", "schnell"),
}

DEFAULT_STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and", "to")

# BPE-ish tokenization: words, digit runs, single punctuation marks.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column, sep: str = " ") -> Column:
    """Whitespace tokenization into an array column."""
    return F.split(text, sep)


def _in_set(words: Sequence[str]):
    """Unary HOF lambda: token ∈ words.

    NOTE: higher-order-function lambdas are arity-inspected by
    PySpark — a default-arg capture (``lambda t, w=w:``) silently
    becomes the binary (element, index) form. Always capture via a
    closure factory like this one.
    """
    wlist = list(words)

    def pred(t: Column) -> Column:
        return t.isin(*wlist)

    return pred


def token_count(text: Column, pattern: str | None = None) -> Column:
    """Token count: whitespace split by default, or regex-match count
    (BPE-ish) when ``pattern`` is given. Returns BIGINT."""
    if pattern is None:
        return F.size(tokens_col(text)).cast("bigint")
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0)).cast("bigint")


def quality_features(
    text: Column, stopwords: Sequence[str] = DEFAULT_STOPWORDS
) -> dict[str, Column]:
    """Quality-scoring features: token count, mean token length,
    stopword ratio, distinct-token ratio (repetition signal)."""
    toks = tokens_col(text)
    n = F.size(toks)
    stop_hits = F.size(F.filter(toks, _in_set(stopwords)))
    return {
        "n_tokens": n.cast("bigint"),
        "avg_token_len": F.length(F.regexp_replace(text, r"\s+", ""))
        / F.greatest(n, F.lit(1)),
        "stopword_ratio": stop_hits / F.greatest(n, F.lit(1)),
        "distinct_ratio": F.size(F.array_distinct(toks))
        / F.greatest(n, F.lit(1)),
    }


def language_scores(
    text: Column,
    profiles: Mapping[str, Sequence[str]] = LANGUAGE_PROFILES,
) -> dict[str, Column]:
    """Per-language stopword-hit ratios + argmax prediction.

    Deterministic tie-break: highest score wins, ties resolved by
    language code order.
    """
    toks = tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1))
    scores = {
        f"score_{lang}": F.size(F.filter(toks, _in_set(words))) / n
        for lang, words in profiles.items()
    }
    gmax = F.greatest(*scores.values())
    pred = None
    for lang in sorted(profiles):  # first-wins → ties go to code order
        cond = scores[f"score_{lang}"] == gmax
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    scores["lang_pred"] = pred.otherwise("unknown")
    return scores


PII_EMAIL_PATTERN = r"[a-z0-9._]+@[a-z0-9.-]+"
PII_NUMBER_PATTERN = r"[0-9]{3,}"


def normalize_scrub_cols(text: Column) -> dict[str, Column]:
    """Normalization + PII scrub for corpus prep: lowercase, redact
    emails → ``[EMAIL]`` and long digit runs → ``[NUM]``, strip
    residual punctuation, collapse whitespace. Redaction counts ride
    along so downstream filtering can drop PII-heavy docs. Pure
    regexp expressions — JVM-side, one scan, no shuffle."""
    lowered = F.lower(text)
    n_emails = F.size(
        F.regexp_extract_all(lowered, F.lit(PII_EMAIL_PATTERN), 0)
    ).cast("bigint")
    scrubbed = F.regexp_replace(lowered, PII_EMAIL_PATTERN, "[EMAIL]")
    n_numbers = F.size(
        F.regexp_extract_all(scrubbed, F.lit(PII_NUMBER_PATTERN), 0)
    ).cast("bigint")
    scrubbed = F.regexp_replace(scrubbed, PII_NUMBER_PATTERN, "[NUM]")
    scrubbed = F.regexp_replace(scrubbed, r"[^a-z0-9\[\] ]", " ")
    scrubbed = F.trim(F.regexp_replace(scrubbed, r"\s+", " "))
    return {
        "scrubbed": scrubbed,
        "n_emails_redacted": n_emails,
        "n_numbers_redacted": n_numbers,
    }


# fastText-style quality classifier: planted logistic-regression
# weights over the quality_features vector. In production these come
# from a trained model file; the MODEL SHAPE (linear in cheap scan-side
# features, sigmoid, threshold) is what the distributed op implements —
# CCNet/LLaMA-style corpus filtering runs exactly this per document.
QUALITY_CLF_WEIGHTS: dict[str, float] = {
    "bias": -3.0,
    "n_tokens": 0.012,  # per token; ~83 tokens to offset the bias
    "avg_token_len": 0.25,
    "stopword_ratio": 4.0,
    "distinct_ratio": 1.5,
}


def quality_classifier_score(
    text: Column,
    weights: Mapping[str, float] | None = None,
    round_digits: int = 6,
) -> dict[str, Column]:
    """Logistic quality score over :func:`quality_features`:
    ``p = sigmoid(w · f + b)``, plus the ``keep`` decision at 0.5.
    Pure built-in expressions (the features are scan-side arithmetic,
    the sigmoid is one exp) — the classifier costs a projection, not
    a UDF; 100 TB of documents score in the same single scan that
    read them."""
    w = dict(QUALITY_CLF_WEIGHTS if weights is None else weights)
    f = quality_features(text)
    z = F.lit(w["bias"])
    for name, col in f.items():
        z = z + F.lit(w[name]) * col
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), round_digits)
    return {"quality_p": p, "keep": p >= 0.5}
