"""Match highlighting: term offsets over a (small) result set.

The reference stores offset/payload attribute streams in the index
(OFFS/PAY, `core/analysis/token_attributes.hpp:37-47,67-72`; pos/pay/offs
files in `core/formats/formats_10.cpp:3618-3634`) so a consumer can
highlight matches. The Spark-first reading inverts the storage decision:
offsets are RECOMPUTED for the top-k result docs at query time instead of
being carried for every token of a 100 TB corpus — the result set is
bounded (top-k x docs-per-query), so a single Arrow-batched pass over the
joined content re-runs the analyzer with span tracking. Storage cost zero,
query cost O(result docs), identical information to the stored-offsets
design.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iresearch_spark.analysis.analyzers import (
    CODE_TOKEN_PATTERN,
    DEFAULT_STOPWORDS,
    TEXT_TOKEN_PATTERN,
)

HIGHLIGHT_SCHEMA = (
    "repo string, path string, commit string, term string, start int, end int"
)


def tokenize_with_offsets(
    text: str, analyzer: str = "code",
    stopwords: frozenset[str] = DEFAULT_STOPWORDS,
) -> list[tuple[str, int, int]]:
    """(term, start, end) per token with ORIGINAL-text character spans (the
    OFFS attribute); the term is the fully analyzed form (lower/stem), the
    span covers the raw input slice it came from."""
    if not text:
        return []
    out: list[tuple[str, int, int]] = []
    if analyzer in ("code", "segmentation"):
        for m in re.finditer(CODE_TOKEN_PATTERN, text, re.IGNORECASE):
            out.append((m.group().lower(), m.start(), m.end()))
        return out
    if analyzer == "text":
        from iresearch_spark.analysis.stem import stem_english, strip_accents

        for m in re.finditer(TEXT_TOKEN_PATTERN, text):
            tok = strip_accents(m.group().lower())
            if tok in stopwords:
                continue
            out.append((stem_english(tok), m.start(), m.end()))
        return out
    raise KeyError(f"no offset-aware tokenizer for analyzer {analyzer!r}")


def highlight_matches(
    results: DataFrame,
    corpus: DataFrame,
    terms,
    analyzer: str = "code",
) -> DataFrame:
    """Spans of the query terms inside each result doc's content.

    ``results``: any DataFrame carrying (repo, path, commit) — typically an
    ``engine.search(...)`` output (bounded top-k, broadcast side);
    ``corpus``: the source table with ``content``. Returns one row per
    matched occurrence: (repo, path, commit, term, start, end).
    """
    termset = frozenset(terms)
    sel = corpus.join(
        F.broadcast(
            results.select("repo", "path", "commit").dropDuplicates()
        ),
        ["repo", "path", "commit"],
    ).select("repo", "path", "commit", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            repos, paths, commits, ts, ss, es = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                for term, start, end in tokenize_with_offsets(
                    row.content, analyzer
                ):
                    if term in termset:
                        repos.append(row.repo)
                        paths.append(row.path)
                        commits.append(row.commit)
                        ts.append(term)
                        ss.append(start)
                        es.append(end)
            yield pd.DataFrame(
                {
                    "repo": pd.Series(repos, dtype="string"),
                    "path": pd.Series(paths, dtype="string"),
                    "commit": pd.Series(commits, dtype="string"),
                    "term": pd.Series(ts, dtype="string"),
                    "start": pd.Series(ss, dtype="int32"),
                    "end": pd.Series(es, dtype="int32"),
                }
            )

    return sel.mapInPandas(kernel, schema=HIGHLIGHT_SCHEMA)
