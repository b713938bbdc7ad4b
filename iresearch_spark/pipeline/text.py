"""Text-analysis operators for training-data pipelines, all JVM-side.

Every op here is pure built-in `pyspark.sql.functions` (whole-stage codegen,
no Python in the hot path) and has an exact DuckDB SQL twin in
``__spark_entry__.oracle_sql`` — tokenization uses the same regex as the
fulltext engine so dl/token counts cross-check the index pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from iresearch_spark.analysis import CODE_TOKEN_PATTERN

STOPWORDS = ("the", "a", "for", "if", "of", "to", "and", "in", "on")

LANG_MARKERS = {
    "en": ("the", "a", "fast", "slow"),
    "es": ("join", "hash", "row"),
    "de": ("scan", "filter", "batch"),
    "fr": ("query", "sort", "window"),
}


def _tokens(col: str = "text") -> Column:
    return F.regexp_extract_all(
        F.lower(F.coalesce(F.col(col), F.lit(""))), F.lit(CODE_TOKEN_PATTERN), F.lit(0)
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counting: total, unique, chars-per-token."""
    t = _tokens()
    return docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_unique"),
        F.aggregate(
            t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
        ).alias("token_chars"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized, lowered text."""
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+", " ")
    )
    return docs.select("doc_id", F.md5(norm).alias("fingerprint"))


def quality_scores(docs: DataFrame) -> DataFrame:
    """Quality heuristics: length, stopword ratio, mean token length,
    non-alnum character ratio — the usual pretraining-corpus filters."""
    t = _tokens()
    n = F.size(t)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(t, lambda x: F.array_contains(stop_arr, x)))
    token_chars = F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
    text_len = F.length(F.coalesce(F.col("text"), F.lit("")))
    non_alnum = text_len - F.length(
        F.regexp_replace(F.coalesce(F.col("text"), F.lit("")), r"[^A-Za-z0-9]", "")
    )
    return docs.select(
        "doc_id",
        text_len.alias("n_chars_obs"),
        n.alias("n_tokens"),
        F.round(n_stop / F.nullif(n.cast("double"), F.lit(0.0)), 4).alias(
            "stop_ratio"
        ),
        F.round(
            token_chars / F.nullif(n.cast("double"), F.lit(0.0)), 4
        ).alias("mean_token_len"),
        F.round(non_alnum / text_len.cast("double"), 4).alias("non_alnum_ratio"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-token language ID (n-gram-heuristic class of langid).

    Deterministic argmax over marker counts with a fixed priority order
    (en > es > de > fr on ties)."""
    t = _tokens()
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(F.filter(t, lambda x: F.array_contains(arr, x)))
    c = counts
    pred = (
        F.when((c["en"] >= c["es"]) & (c["en"] >= c["de"]) & (c["en"] >= c["fr"]), "en")
        .when((c["es"] >= c["de"]) & (c["es"] >= c["fr"]), "es")
        .when(c["de"] >= c["fr"], "de")
        .otherwise("fr")
    )
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        (pred == F.col("lang")).cast("int").alias("is_correct"),
    )
