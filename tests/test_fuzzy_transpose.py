"""Transposition-aware fuzzy (Damerau): the ``with_transpositions`` option
of by_edit_distance (`core/search/levenshtein_filter.hpp:67`).

- ``damerau_levenshtein`` must agree with DuckDB's ``damerau_levenshtein``
  (the driver oracle twin) on adversarial pairs.
- Engine: Fuzzy(with_transpositions=True) == TermsF over the brute-force
  Damerau expansion of the dictionary (same instances -> same scores).
"""

import duckdb
import pytest

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.build import build_index
from iresearch_spark.search import Fuzzy, SearchEngine, TermsF
from iresearch_spark.search.filters import damerau_levenshtein

PAIRS = [
    ("ca", "abc"),       # unrestricted beats OSA (2 vs 3)
    ("ab", "ba"),
    ("spark", "sprak"),
    ("spark", "sparrk"),
    ("abcdef", "abcfed"),
    ("", "abc"),
    ("abc", ""),
    ("same", "same"),
    ("kitten", "sitting"),
    ("a_cat", "an_act"),
    ("transpose", "tranpsose"),
]


def test_damerau_matches_duckdb():
    con = duckdb.connect()
    for a, b in PAIRS:
        want = con.sql(
            "select damerau_levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_damerau"))
    corpus = generate_corpus(spark, 150, num_partitions=2, min_tokens=30,
                             max_tokens=200)
    build_index(spark, corpus, d, num_segments=2)
    return SearchEngine(spark, d)


@pytest.mark.parametrize("query,dist", [("improt", 1), ("impotr", 2),
                                        ("sym_10", 1)])
def test_fuzzy_transpositions_equal_manual_expansion(engine, query, dist):
    vocab = [
        r["term"]
        for r in engine.spark.read.parquet(f"{engine.index_dir}/segments")
        .select("term")
        .distinct()
        .collect()
    ]
    expanded = sorted(
        t for t in vocab if damerau_levenshtein(t, query) <= dist
    )
    assert expanded, "test query should match something"
    got = {
        (r["segment_id"], r["doc_id"]): r["score"]
        for r in engine.search(
            Fuzzy(term=query, max_distance=dist, with_transpositions=True),
            k=None,
        ).collect()
    }
    want = {
        (r["segment_id"], r["doc_id"]): r["score"]
        for r in engine.search(TermsF(terms=tuple(expanded)), k=None).collect()
    }
    # identical doc sets; scores agree up to float32 summation order (the
    # fuzzy node sums sub-terms in df-desc rank order, TermsF in given order)
    assert set(got) == set(want)
    import numpy as np

    assert np.allclose(
        [got[k_] for k_ in sorted(got)],
        [want[k_] for k_ in sorted(got)],
        rtol=1e-5,
    )


def test_transpositions_widen_matches(engine):
    """'improt' is 1 transposition from 'import' (damerau 1, levenshtein 2):
    plain fuzzy at d=1 must MISS it, transposition-aware must HIT it."""
    plain = engine.search(
        Fuzzy(term="improt", max_distance=1), k=None
    ).count()
    damerau = engine.search(
        Fuzzy(term="improt", max_distance=1, with_transpositions=True),
        k=None,
    ).count()
    assert damerau > plain
