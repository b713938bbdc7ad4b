"""TFIDF golden parity on the reference's own corpora.

`tfidf_test.cpp` hard-codes expected doc orders under
`irs::TFIDF{false, true}` (no norms, boost-as-score) — the no-norm branch
our ``TFIDF(with_norms=False)`` replicates (idf = log1p((N+1)/(df+1)),
score = sqrt(tf) * idf, `tfidf.cpp:185-187, 274-277`).

Covered verbatim from the C++ arrays:

- ``test_query`` (`tfidf_test.cpp:528-1176`) over
  `simple_sequential_order.json` (string_field inserts, one segment):
  by_term, by_range with every boundary-type combination (the orders
  [7,0,1,3,5] / [0,7,5,1,3,2] pin the exact idf weighting across terms),
  by_range under scored_terms_limit 0 and 1, and a single-slot by_phrase.
- ``test_phrase`` (`tfidf_test.cpp:361-520`) over
  `phrase_sequential.json`: the fixed phrase "jumps high" (tf=2 doc first,
  then insertion-order ties) and the variadic phrase
  "cookies ca* p_e biscuit~1 meringue|marshmallows" mixing term, prefix,
  wildcard, edit-distance, and terms-set slots
  (`phrase_filter.hpp:38-150`).

The reference reads these resources at test time; we do the same
(read-only) and skip cleanly if the reference tree is absent.
"""

import json
import os

import pytest

from iresearch_spark.index import build_index
from iresearch_spark.search import (
    Fuzzy,
    Phrase,
    Prefix,
    SearchEngine,
    TermF,
    TermRange,
    TermsF,
    Wildcard,
)
from iresearch_spark.search.scorers import TFIDF

REF = "/root/reference/tests/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference resources not available"
)

SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)

# irs::TFIDF{false, true}: no length normalization
TFIDF_NONORM = TFIDF(with_norms=False)


def _load(name: str):
    with open(os.path.join(REF, name), "rb") as fh:
        return json.load(fh)


@pytest.fixture(scope="module")
def order_engine(spark, tmp_path_factory):
    """simple_sequential_order.json, ONE segment, each doc's `field` array
    joined into one token stream (repeated string_field inserts -> tf =
    value multiplicity), scored by no-norm TFIDF."""
    docs = _load("simple_sequential_order.json")
    d = str(tmp_path_factory.mktemp("idx_tfidf_order"))
    rows = [
        ("r", f"{doc['seq']:02d}.json", "c", "json", " ".join(doc["field"]))
        for doc in docs
    ]
    build_index(spark, spark.createDataFrame(rows, SCHEMA), d,
                num_segments=1)
    return SearchEngine(spark, d, scorer=TFIDF_NONORM)


def _seq_order(engine, filt, k=None):
    rows = engine.search(filt, k=k).collect()
    return [int(r["path"].split(".")[0]) for r in rows]


def test_tfidf_by_term_golden(order_engine):
    """tfidf_test.cpp test_query by_term '7' -> seq {0, 1, 5, 7}."""
    assert _seq_order(order_engine, TermF(term="7")) == [0, 1, 5, 7]


def test_tfidf_range_exclusive_both_golden(order_engine):
    """by_range ('6','8') EXCLUSIVE/EXCLUSIVE -> only term '7' ->
    seq {0, 1, 5, 7} (tfidf_test.cpp:939)."""
    q = TermRange(min_term="6", max_term="8",
                  include_min=False, include_max=False)
    assert _seq_order(order_engine, q) == [0, 1, 5, 7]


@pytest.mark.parametrize("limit", [0, 1])
def test_tfidf_range_scored_terms_limit_golden(order_engine, limit):
    """by_range ['8','9') under scored_terms_limit 0 and 1 -> seq {3, 7}
    (tfidf_test.cpp:992): with limit=0 both docs ride the unscored rest
    (equal zero scores, doc order); with limit=1 the single term '8' is
    scored — the membership and order are identical either way."""
    q = TermRange(min_term="8", max_term="9",
                  include_min=True, include_max=False,
                  scored_terms_limit=limit)
    assert _seq_order(order_engine, q) == [3, 7]


def test_tfidf_range_excl_incl_golden(order_engine):
    """by_range ('6','8'] -> terms {'7','8'} -> seq {7, 0, 1, 3, 5}
    (tfidf_test.cpp:1043): doc 7 sums both idfs; '8' (df=2) out-idfs
    '7' (df=4) between docs 3 and 5."""
    q = TermRange(min_term="6", max_term="8",
                  include_min=False, include_max=True)
    assert _seq_order(order_engine, q) == [7, 0, 1, 3, 5]


def test_tfidf_range_incl_incl_golden(order_engine):
    """by_range ['6','8'] -> terms {'6','7','8'} -> seq {0, 7, 5, 1, 3, 2}
    (tfidf_test.cpp:1094) — the full three-term idf interleaving."""
    q = TermRange(min_term="6", max_term="8",
                  include_min=True, include_max=True)
    assert _seq_order(order_engine, q) == [0, 7, 5, 1, 3, 2]


def test_tfidf_phrase_single_slot_golden(order_engine):
    """by_phrase of the single slot '7' -> seq {0, 1, 5, 7}
    (tfidf_test.cpp:1142) — a one-term phrase scores like the term."""
    assert _seq_order(order_engine, Phrase(terms=("7",))) == [0, 1, 5, 7]


# ---------------------------------------------------------------- phrases


@pytest.fixture(scope="module")
def phrase_engine(spark, tmp_path_factory):
    """phrase_sequential.json, ONE segment; paths prefixed with the file
    position so doc order reproduces the reference's insertion order
    (ties in the C++ multimap keep insertion = doc order)."""
    docs = _load("phrase_sequential.json")
    d = str(tmp_path_factory.mktemp("idx_tfidf_phrase"))
    rows = [
        ("r", f"{i:02d}_{doc['name']}", "c", "txt", doc["phrase"])
        for i, doc in enumerate(docs)
    ]
    build_index(spark, spark.createDataFrame(rows, SCHEMA), d,
                num_segments=1)
    return SearchEngine(spark, d, scorer=TFIDF_NONORM)


def _name_order(engine, filt, k=None):
    rows = engine.search(filt, k=k).collect()
    return [r["path"].split("_", 1)[1] for r in rows]


def test_tfidf_phrase_jumps_high_golden(phrase_engine):
    """tfidf_test.cpp test_phrase "jumps high" -> {O, P, Q, R}: O matches
    twice (tf=2), P/Q/R once each, tie-broken in doc order."""
    q = Phrase(terms=("jumps", "high"))
    assert _name_order(phrase_engine, q) == ["O", "P", "Q", "R"]


def test_tfidf_variadic_phrase_golden(phrase_engine):
    """tfidf_test.cpp test_phrase "cookies ca* p_e biscuit~1
    meringue|marshmallows" -> {SPWLC0, SPWLC1, SPWLC2, SPWLC3}: term,
    prefix, wildcard, edit-distance, and terms-set slots in one variadic
    phrase; SPWLC0 matches twice, the rest tie in doc order."""
    q = Phrase(
        terms=(
            "cookies",
            Prefix(prefix="ca"),
            Wildcard(pattern="p_e"),
            Fuzzy(term="biscuit", max_distance=1),
            TermsF(terms=("meringue", "marshmallows")),
        )
    )
    assert _name_order(phrase_engine, q) == [
        "SPWLC0", "SPWLC1", "SPWLC2", "SPWLC3",
    ]


def test_bm25_phrase_jumps_high_golden(spark, phrase_engine):
    """bm25_test.cpp test_phrase (`:365-441`, scorer bm25 with b=0): the
    same "jumps high" phrase ranks {O, P, Q, R} under BM25's saturating
    tf too — O's pf=2 beats the pf=1 trio, which tie in doc order."""
    from iresearch_spark.search.scorers import BM25

    eng = SearchEngine(spark, phrase_engine.index_dir, scorer=BM25(b=0.0))
    try:
        q = Phrase(terms=("jumps", "high"))
        assert _name_order(eng, q) == ["O", "P", "Q", "R"]
    finally:
        eng.close()
