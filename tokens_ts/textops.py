"""Text analysis operators for training-data pipelines.

Token counting (whitespace), quality scoring (type-token ratio, avg
word length, stopword ratio), language-ID (word-profile scoring), and
document fingerprinting (min-hash over character 8-grams, a winnowing-
style rolling fingerprint) — every operator is a pure Catalyst
expression (no UDFs), so it runs inside whole-stage codegen and its
filters push down to the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

def _words():
    # built lazily: Column construction needs an active SparkContext
    return F.split(F.trim(F.col("text")), r"\s+")


def with_token_count(docs: DataFrame) -> DataFrame:
    """Whitespace token count (the cheapest budget-planning proxy)."""
    return docs.withColumn("n_words", F.size(_words()).cast("bigint"))


# BPE-ish pre-tokenizer: word chunks, numbers, and each punctuation
# mark as its own token — the GPT-2-style pre-split shape (the real
# BPE merge table then only shrinks counts within chunks, so this
# upper-bounds true BPE token counts far tighter than whitespace).
BPE_SPLIT_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def with_token_count_bpe(docs: DataFrame) -> DataFrame:
    """BPE-ish regex token count + a chars/4 subword estimate.

    Pattern passed as a lit() column, NOT interpolated into F.expr —
    SQL string literals eat single backslashes, so an expr-embedded
    '\\s' silently becomes 's' and whitespace starts matching."""
    toks = F.regexp_extract_all(F.col("text"), F.lit(BPE_SPLIT_RE), F.lit(0))
    return docs.withColumn(
        "n_bpe_tokens", F.size(toks).cast("bigint")
    ).withColumn(
        "n_subword_est",
        F.ceil(F.length(F.col("text")) / F.lit(4.0)).cast("bigint"),
    )


def with_quality(docs: DataFrame) -> DataFrame:
    """Quality features: type-token ratio, mean word length, stopword
    ratio — the standard cheap filters for web-scale corpus curation."""
    w = _words()
    n = F.size(w).cast("double")
    distinct_n = F.size(F.array_distinct(w)).cast("double")
    sum_len = F.aggregate(
        F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    ).cast("double")
    stop_n = F.size(F.filter(w, lambda x: x.isin("a", "the"))).cast("double")
    return (
        docs.withColumn("n_words", n.cast("bigint"))
        .withColumn("ttr", distinct_n / n)
        .withColumn("avg_word_len", sum_len / n)
        .withColumn("stopword_ratio", stop_n / n)
    )


# deterministic word profiles for language-ID scoring. The sandbox
# corpus is synthetic English-ish jargon for every `lang` label, so the
# profiles are synthetic too — the operator shape (profile scoring +
# argmax) is what matters and is exactly how an n-gram langid works.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "p_en": ("the", "a"),
    "p_sql": ("value", "table"),
    "p_q": ("query", "scan"),
    "p_data": ("spark", "data"),
}


def with_langid(docs: DataFrame) -> DataFrame:
    w = _words()
    scored = docs
    for name, prof in LANG_PROFILES.items():
        scored = scored.withColumn(
            name, F.size(F.filter(w, lambda x: x.isin(*prof)))
        )
    names = list(LANG_PROFILES)
    pred = F.lit(None).cast("string")
    best = F.greatest(*[F.col(n) for n in names])
    # first profile (declaration order) wins ties — mirrored in SQL
    for name in reversed(names):
        pred = F.when(F.col(name) == best, F.lit(name)).otherwise(pred)
    return scored.withColumn("pred", pred)


def with_fingerprint(docs: DataFrame, gram: int = 8, stride: int = 4) -> DataFrame:
    """Rolling-hash fingerprint: min md5 over char k-grams at a stride.

    Collapses near-identical boilerplate to one fingerprint (winnowing
    with window = whole doc); group-by fingerprint ≈ cheap near-dedup."""
    return docs.withColumn(
        "fingerprint",
        F.expr(
            f"array_min(transform(sequence(1, greatest(length(text) - {gram - 1}, 1), {stride}),"
            f" i -> md5(substring(text, i, {gram}))))"
        ),
    )
