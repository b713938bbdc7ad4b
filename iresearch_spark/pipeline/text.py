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


#: GPT-2-class pretokenizer shape (contractions, letter runs, digit runs,
#: punctuation runs) on case-folded text — RE2-compatible so the DuckDB
#: oracle runs the IDENTICAL pattern. Used for token-budget estimation.
BPE_PRETOKEN_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s']+"


def bpe_token_estimate(docs: DataFrame) -> DataFrame:
    """Per-doc token-budget estimate under a BPE-ish pretokenizer: the
    pretoken count (each pretoken splits into >=1 BPE tokens, so this is the
    lower bound the usual chars/4 heuristic approximates) plus chars/4."""
    pre = F.regexp_extract_all(
        F.lower(F.coalesce(F.col("text"), F.lit(""))),
        F.lit(BPE_PRETOKEN_PATTERN), F.lit(0),
    )
    text_len = F.length(F.coalesce(F.col("text"), F.lit("")))
    return docs.select(
        "doc_id",
        F.size(pre).alias("n_pretokens"),
        F.ceil(text_len / F.lit(4.0)).cast("long").alias("est_chars_div4"),
    )


def winnowing_fingerprints(
    docs: DataFrame, k: int = 5, w: int = 4
) -> DataFrame:
    """Winnowing document fingerprints (the MOSS rolling-hash scheme,
    Schleimer et al. 2003): hash every k-token shingle, slide a w-hash
    window, keep each window's minimum — guarantees any match of length
    >= w + k - 1 tokens shares a fingerprint, at ~2/(w+1) selection density.

    All JVM built-ins: the shingle hash is md5 of the joined tokens and the
    window minimum is the LEXICOGRAPHIC min of the hex digests (identical
    semantics in DuckDB, which lacks Spark's integer hashes). Formulated as
    explode + window functions rather than nested array ``transform``s:
    Catalyst's projection collapse inlines a named array column into an
    outer transform and re-evaluates it PER PRODUCED ELEMENT (the
    generator-adjacency trap, see CLAUDE.md) — measured 60x slower than
    this row-wise plan at sf0.1. One shuffle, partitioned by doc_id.
    """
    from pyspark.sql import Window

    t = docs.select(
        "doc_id", F.posexplode(_tokens()).alias("i", "tok")
    )
    wo = Window.partitionBy("doc_id").orderBy("i")
    parts = [F.col("tok")] + [
        F.lead("tok", j).over(wo) for j in range(1, k)
    ]
    sh = (
        t.select(
            "doc_id",
            "i",
            F.when(
                F.lead("tok", k - 1).over(wo).isNotNull(),
                F.md5(F.concat_ws(" ", *parts)),
            ).alias("sh"),
        )
        .where(F.col("sh").isNotNull())
    )
    wmin = Window.partitionBy("doc_id").orderBy("i").rowsBetween(0, w - 1)
    fps = (
        sh.select(
            "doc_id",
            F.min("sh").over(wmin).alias("fingerprint"),
            F.lead("sh", w - 1).over(wo).isNotNull().alias("full_window"),
        )
        .where("full_window")
        .select("doc_id", "fingerprint")
        .distinct()
    )
    return fps


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
