"""Analyzer registry — vectorized token streams.

The reference registers analyzers by name with JSON options
(`core/analysis/analyzers.{hpp,cpp}:224-247`); ours is a Python registry of
*vectorized* tokenizers: each takes a ``pandas.Series`` of strings and returns
a ``pandas.Series`` of ``list[str]`` token lists (positions are the list
ordinal, matching the reference's increment/position attribute chain,
`core/analysis/token_attributes.hpp:50-54`).

Analyzers implemented (reference counterpart):
- ``code`` / ``segmentation``: word-break + lower-case, the moral equivalent of
  `core/analysis/segmentation_token_stream.cpp` for source code: identifiers
  ``[a-z_][a-z0-9_]*`` and integer literals, on case-folded text. The pattern
  is deliberately expressible in Spark SQL (`regexp_extract_all`) and DuckDB
  for oracle parity.
- ``identity``: whole input as one token (`token_streams.hpp:87-113`).
- ``delimiter``: split on a delimiter (`delimited_token_stream.cpp`).
- ``ngram``: char n-grams (`ngram_token_stream.cpp`).
- ``norm``: lower-case, no tokenization (`text_token_normalizing_stream.cpp`).
- ``stopwords``: drop exact-match tokens (`token_stopwords_stream.cpp`).
- ``pipeline``: composition (`pipeline_token_stream.cpp`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import pandas as pd

# Keep in sync with SQL oracles: Spark `regexp_extract_all(lower(x), ...)`
# and DuckDB `regexp_extract_all(lower(x), ...)` must tokenize identically.
CODE_TOKEN_PATTERN = r"[a-z_][a-z0-9_]*|[0-9]+"

Analyzer = Callable[[pd.Series], pd.Series]


def code_analyzer(s: pd.Series) -> pd.Series:
    """Case-folded identifier/number tokens; vectorized pandas str ops."""
    return s.fillna("").str.lower().str.findall(CODE_TOKEN_PATTERN)


def identity_analyzer(s: pd.Series) -> pd.Series:
    return s.fillna("").map(lambda x: [x])


def norm_lower_analyzer(s: pd.Series) -> pd.Series:
    return s.fillna("").str.lower().map(lambda x: [x])


def delimiter_analyzer(s: pd.Series, delimiter: str = ",") -> pd.Series:
    return s.fillna("").str.split(delimiter)


def ngram_analyzer(s: pd.Series, n_min: int = 3, n_max: int = 3) -> pd.Series:
    def grams(x: str) -> list[str]:
        out = []
        for n in range(n_min, n_max + 1):
            out.extend(x[i : i + n] for i in range(len(x) - n + 1))
        return out

    return s.fillna("").map(grams)


def stopwords_filter(tokens: pd.Series, stopwords: frozenset[str]) -> pd.Series:
    return tokens.map(lambda ts: [t for t in ts if t not in stopwords])


def pipeline(*stages: Analyzer) -> Analyzer:
    def run(s: pd.Series) -> pd.Series:
        out = s
        for st in stages:
            out = st(out)
        return out

    return run


# default English stopword list of the reference's `text` analyzer is
# locale-dependent; this fixed small set keeps builds deterministic
DEFAULT_STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the "
    "to was were will with".split()
)


def text_analyzer(
    s: pd.Series, stopwords: frozenset[str] = DEFAULT_STOPWORDS
) -> pd.Series:
    """`text` analyzer core pipeline (text_token_stream.cpp): locale word
    split + lower + stopword removal. Accent-strip and snowball stemming are
    omitted (no ICU/stemmer in this environment; positions/token identity
    semantics are what the engine consumes)."""
    return stopwords_filter(code_analyzer(s), stopwords)


def stopwords_analyzer(
    s: pd.Series, stopwords: frozenset[str] = DEFAULT_STOPWORDS
) -> pd.Series:
    return stopwords_filter(identity_analyzer(s), stopwords)


ANALYZERS: dict[str, Analyzer] = {
    "code": code_analyzer,
    "segmentation": code_analyzer,
    "identity": identity_analyzer,
    "norm": norm_lower_analyzer,
    "delimiter": delimiter_analyzer,
    "ngram": ngram_analyzer,
    "text": text_analyzer,
    "stopwords": stopwords_analyzer,
}


def get_analyzer(name: str, **options) -> Analyzer:
    if name not in ANALYZERS:
        raise KeyError(f"unknown analyzer {name!r}; have {sorted(ANALYZERS)}")
    fn = ANALYZERS[name]
    return partial(fn, **options) if options else fn


def tokenize_series(s: pd.Series, analyzer: str = "code") -> pd.Series:
    return get_analyzer(analyzer)(s)
