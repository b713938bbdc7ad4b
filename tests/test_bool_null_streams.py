"""bool/null sentinel token streams (`core/analysis/token_streams.hpp:47-82,
253-277`): a boolean field indexes \\xFF/\\x00 single-byte terms, a null
field indexes the empty term — equality on bool/null becomes a term query.
"""

import pandas as pd
import pytest

from iresearch_spark.analysis import get_analyzer
from iresearch_spark.analysis.analyzers import (
    BOOL_FALSE_TOKEN,
    BOOL_TRUE_TOKEN,
    NULL_TOKEN,
)
from iresearch_spark.index.build import build_index
from iresearch_spark.search import SearchEngine, TermF

ROWS = [
    # repo, path, commit, lang, content, flag, opt
    ("r", "0001", "c", "py", "alpha beta", True, None),
    ("r", "0002", "c", "py", "beta gamma", False, "x"),
    ("r", "0003", "c", "py", "gamma delta", None, None),
    ("r", "0004", "c", "py", "delta alpha", True, "y"),
]
COLS = ["repo", "path", "commit", "lang", "content", "flag", "opt"]


def test_boolean_analyzer_golden():
    toks = get_analyzer("boolean")(pd.Series([True, False, None]))
    assert list(toks) == [[BOOL_TRUE_TOKEN], [BOOL_FALSE_TOKEN], []]
    assert BOOL_TRUE_TOKEN == "\xff" and BOOL_FALSE_TOKEN == "\x00"


def test_null_analyzer_golden():
    toks = get_analyzer("null")(pd.Series(["a", None, "b", None]))
    assert list(toks) == [[], [NULL_TOKEN], [], [NULL_TOKEN]]
    assert NULL_TOKEN == ""


@pytest.fixture(scope="module")
def bn_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_boolnull"))
    schema = (
        "repo string, path string, commit string, lang string, "
        "content string, flag boolean, opt string"
    )
    corpus = spark.createDataFrame(ROWS, schema)
    build_index(
        spark, corpus, d, num_segments=2,
        fields=[("content", "code"), ("flag", "boolean"), ("opt", "null")],
    )
    return SearchEngine(spark, d)


def _paths(engine, filt):
    return sorted(
        r["path"] for r in engine.search(filt, k=None).collect()
    )


def test_bool_true_term_query(bn_engine):
    got = _paths(bn_engine, TermF(field_name="flag", term=BOOL_TRUE_TOKEN))
    assert got == ["0001", "0004"]


def test_bool_false_term_query(bn_engine):
    got = _paths(bn_engine, TermF(field_name="flag", term=BOOL_FALSE_TOKEN))
    assert got == ["0002"]  # NULL flag (0003) indexes nothing


def test_null_term_query(bn_engine):
    got = _paths(bn_engine, TermF(field_name="opt", term=NULL_TOKEN))
    assert got == ["0001", "0003"]
