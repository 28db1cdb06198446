"""Text analysis for training-data pipelines: quality scoring, token
counting, language profiling, document fingerprinting.

Everything is built-in expression work (split / regexp / array
higher-order functions) — JVM-side, no UDFs, scales linearly with one
narrow projection per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from confluent_kafka_streams_examples_spark.functions.scalar import round_det

#: tiny English-ish stopword list used by the quality heuristic (matches
#: the vocabulary of the synthetic documents table)
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

#: BPE-ish token pattern: runs of alphanumerics or single non-space symbols
TOKEN_PATTERN = r"[a-z0-9]+"


def text_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality features:

    - n_tokens: whitespace tokens
    - n_regex_tokens: BPE-ish regex token count
    - avg_token_len
    - stopword_ratio: fraction of tokens in STOPWORDS
    - uniq_ratio: distinct/total tokens (repetition indicator)
    - quality_score: length-normalized heuristic in [0,1]
    """
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_uniq = F.size(F.array_distinct(toks))
    avg_len = (F.length(F.col(text_col)) - (n_tokens - 1)) / n_tokens
    stop_ratio = n_stop / n_tokens
    uniq_ratio = n_uniq / n_tokens
    quality = F.least(F.lit(1.0), n_tokens / F.lit(100.0)) * (
        F.lit(1.0) - stop_ratio * F.lit(0.5)
    ) * uniq_ratio
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_PATTERN), 0)).alias(
            "n_regex_tokens"
        ),
        round_det(avg_len, 4).alias("avg_token_len"),
        round_det(stop_ratio, 4).alias("stopword_ratio"),
        round_det(uniq_ratio, 4).alias("uniq_ratio"),
        round_det(quality, 4).alias("quality_score"),
    )


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Normalized content fingerprint (md5 of lower/trimmed text) —
    groups byte-identical-after-normalization documents."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint"),
    )


def fingerprint_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fingerprint groups with >1 member: the normalized-exact-dup report."""
    return (
        doc_fingerprint(df, id_col, text_col)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") > 1)
    )


def lang_profile(df: DataFrame) -> DataFrame:
    """Language/source distribution with length stats — the corpus-audit
    aggregation run before training-data selection."""
    return df.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(F.size(F.split(F.col("text"), " "))), 4).alias("avg_tokens"),
    )


def lang_id_heuristic(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """N-gram/stopword language-ID heuristic: scores text against a tiny
    English function-word profile; emits the score and a binary call.
    (The synthetic corpus is English-wordlist text with random lang
    labels, so this is exercised as an operator, not validated against
    the label.)"""
    toks = F.split(F.col(text_col), " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    score = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / F.size(toks)
    return df.select(
        F.col(id_col),
        round_det(score, 4).alias("en_score"),
        (score >= 0.05).cast("boolean").alias("pred_en"),
    )
