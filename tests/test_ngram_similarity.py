"""by_ngram_similarity: positionally-ordered gram overlap with threshold."""

import pandas as pd
import pytest

from iresearch_spark.index.build import build_index
from iresearch_spark.search import NGramSimilarity, SearchEngine, TermF
from iresearch_spark.search.filters import Empty, rewrite


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    texts = {
        "full": "aa bb cc dd ee",          # all 4 grams in order
        "threequarters": "aa xx cc xx dd", # a c d -> 3/4
        "reversed": "dd cc bb aa",         # order violated -> LIS 1
        "repeat": "aa aa bb bb",           # duplicates available
        "none": "xx yy zz",
    }
    pdf = pd.DataFrame(
        {
            "repo": ["r"] * len(texts),
            "path": list(texts),
            "commit": [f"c{i}" for i in range(len(texts))],
            "lang": ["t"] * len(texts),
            "content": list(texts.values()),
        }
    )
    d = str(tmp_path_factory.mktemp("idx_ng"))
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=1)
    return SearchEngine(spark, d)


def _matches(engine, filt):
    rows = engine.search(filt, k=None).collect()
    return {r["path"]: round(float(r["score"]), 4) for r in rows}


QUERY = ("aa", "bb", "cc", "dd")


def test_threshold_full_only(engine):
    got = _matches(engine, NGramSimilarity(terms=QUERY, threshold=1.0))
    assert got == {"full": 1.0}


def test_threshold_three_quarters(engine):
    got = _matches(engine, NGramSimilarity(terms=QUERY, threshold=0.75))
    assert got == {"full": 1.0, "threequarters": 0.75}


def test_low_threshold_counts_order_violations_once(engine):
    got = _matches(engine, NGramSimilarity(terms=QUERY, threshold=0.25))
    # reversed doc: only one gram can be used in order
    assert got["reversed"] == 0.25
    # repeat doc: aa then bb -> degree 2
    assert got["repeat"] == 0.5
    assert "none" not in got


def test_boost_scales_score(engine):
    got = _matches(
        engine, NGramSimilarity(terms=QUERY, threshold=0.75, boost=2.0)
    )
    assert got["full"] == 2.0


def test_duplicate_query_grams_need_distinct_occurrences(engine):
    # query (aa, aa): "repeat" has two aa occurrences -> degree 2;
    # "full" has one aa -> degree 1 of 2
    got = _matches(engine, NGramSimilarity(terms=("aa", "aa"), threshold=1.0))
    assert got == {"repeat": 1.0}
    got2 = _matches(engine, NGramSimilarity(terms=("aa", "aa"), threshold=0.5))
    assert got2["full"] == 0.5


def test_rewrites():
    assert rewrite(NGramSimilarity(terms=(), threshold=0.5)) == Empty()
    assert rewrite(NGramSimilarity(terms=("x",), threshold=0.5)) == TermF(term="x")
