"""Deterministic synthetic source-code corpus (FIXTURES.md F1).

Shape = the BASELINE input_hint: ``(repo, path, commit, lang, content)``.
Zipfian term frequencies (hot terms ``import int return def void`` dominate —
exercises hot-term skew), per-file unique identifiers (exercise singleton
posting lists, cf. reference single-doc inlining `formats_10.cpp:676`).

Generation is parallelism-invariant: every row is derived only from its
global row id (seeded per row), so ``local[8]`` and ``local[32]`` produce the
byte-identical corpus — required for the scaling-efficiency benchmark and for
resume determinism. Generated distributively with ``mapInPandas`` over
``spark.range`` (no driver-side materialization), so it scales to any size.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
VOCAB_SIZE = 50_000
HOT_TERMS = ["import", "int", "return", "def", "void", "the", "for", "if"]
EXTS = [("py", "python"), ("cpp", "cpp"), ("hpp", "cpp"), ("java", "java"),
        ("rs", "rust"), ("go", "go")]
ZIPF_S = 1.07

_VOCAB: list[str] | None = None
_CDF: np.ndarray | None = None


def _vocab_cdf() -> tuple[list[str], np.ndarray]:
    global _VOCAB, _CDF
    if _VOCAB is None:
        base = [f"sym_{i}" for i in range(VOCAB_SIZE - len(HOT_TERMS))]
        _VOCAB = HOT_TERMS + base
        ranks = np.arange(1, VOCAB_SIZE + 1, dtype=np.float64)
        p = 1.0 / ranks**ZIPF_S
        _CDF = np.cumsum(p / p.sum())
    return _VOCAB, _CDF


def make_rows(ids: np.ndarray, min_tokens: int = 60, max_tokens: int = 900) -> pd.DataFrame:
    """Pure function: global row ids -> corpus rows (used by Spark and tests)."""
    vocab, cdf = _vocab_cdf()
    vocab_arr = np.asarray(vocab, dtype=object)
    repos, paths, commits, langs, contents = [], [], [], [], []
    for i in ids.tolist():
        rng = np.random.default_rng(SEED * 1_000_003 + i)
        ext, lang = EXTS[i % len(EXTS)]
        repo = f"org{i % 7}/repo{i % 53}"
        path = f"src/d{i % 17}/f{i}.{ext}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        ntok = int(rng.integers(min_tokens, max_tokens + 1))
        tok_ids = np.searchsorted(cdf, rng.random(ntok))
        toks = vocab_arr[tok_ids].tolist()
        # per-file unique identifiers -> singleton posting lists
        toks.extend([f"uniq_{i}_a", f"uniq_{i}_b"])
        lines = [" ".join(toks[j : j + 9]) for j in range(0, len(toks), 9)]
        repos.append(repo)
        paths.append(path)
        commits.append(commit)
        langs.append(lang)
        contents.append("\n".join(lines))
    return pd.DataFrame(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs,
         "content": contents}
    )


CORPUS_SCHEMA = "repo string, path string, commit string, lang string, content string"


def generate_corpus(
    spark: SparkSession,
    n_docs: int,
    num_partitions: int | None = None,
    min_tokens: int = 60,
    max_tokens: int = 900,
) -> DataFrame:
    num_partitions = num_partitions or max(1, min(n_docs // 1000, 256))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield make_rows(pdf["id"].to_numpy(), min_tokens, max_tokens)

    return spark.range(0, n_docs, numPartitions=num_partitions).mapInPandas(
        gen, schema=CORPUS_SCHEMA
    )


def make_corpus_pdf(n_docs: int, min_tokens: int = 60, max_tokens: int = 900) -> pd.DataFrame:
    """Driver-side small corpus for unit tests / the naive oracle."""
    return make_rows(np.arange(n_docs), min_tokens, max_tokens)
