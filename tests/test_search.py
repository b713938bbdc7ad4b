"""Rank-identity tests: engine vs independent oracle on the reference-style
query set (FIXTURES.md F2): hot / mid / rare / absent terms, disjunctions,
conjunctions, min_match, negation, phrase, prefix, wildcard, range, fuzzy.

Pass criterion: top-k (docID, score) lists are identical — float32 bitwise
score equality and identical order, mirroring the reference BM25 ranking
assertions (`tests/search/bm25_test.cpp:528-600`).
"""

import numpy as np
import pytest

from iresearch_spark.corpus import generate_corpus, make_corpus_pdf
from iresearch_spark.index.build import build_index
from iresearch_spark.search import (
    All,
    And,
    Fuzzy,
    Not,
    Or,
    Phrase,
    Prefix,
    SearchEngine,
    TermF,
    TermRange,
    TermsF,
    Wildcard,
)
from tests.oracle import OracleEngine

N_DOCS = 400
N_SEGMENTS = 4


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("idx_search"))
    corpus = generate_corpus(spark, N_DOCS, num_partitions=4, min_tokens=40,
                             max_tokens=500)
    build_index(spark, corpus, index_dir, num_segments=N_SEGMENTS)
    return SearchEngine(spark, index_dir)


@pytest.fixture(scope="module")
def oracle():
    return OracleEngine(
        make_corpus_pdf(N_DOCS, min_tokens=40, max_tokens=500), N_SEGMENTS
    )


QUERIES = [
    ("term_hot", TermF(term="import"), 10),
    ("term_mid", TermF(term="sym_50"), 10),
    ("term_rare", TermF(term="sym_20000"), 10),
    ("term_singleton", TermF(term="uniq_7_a"), 10),
    ("term_absent", TermF(term="zz_not_there"), 10),
    ("disj_2", Or(children=(TermF(term="import"), TermF(term="sym_9"))), 10),
    (
        "disj_4_k100",
        Or(children=(TermF(term="void"), TermF(term="sym_3"),
                     TermF(term="sym_777"), TermF(term="sym_20001"))),
        100,
    ),
    (
        "conj_2",
        And(children=(TermF(term="import"), TermF(term="sym_100"))),
        10,
    ),
    (
        "conj_3",
        And(children=(TermF(term="def"), TermF(term="sym_7"), TermF(term="sym_55"))),
        10,
    ),
    (
        "minmatch_2of3",
        Or(children=(TermF(term="sym_40"), TermF(term="sym_41"),
                     TermF(term="sym_42")), min_match=2),
        20,
    ),
    ("terms_minmatch", TermsF(terms=("sym_11", "sym_12", "sym_13"), min_match=2), 20),
    (
        "not_",
        And(children=(TermF(term="import"), Not(child=TermF(term="sym_8")))),
        10,
    ),
    ("lone_not", Not(child=TermF(term="import")), 10),
    ("prefix", Prefix(prefix="sym_123"), 10),
    ("wildcard", Wildcard(pattern="sym_1%7"), 10),
    ("range", TermRange(min_term="sym_100", max_term="sym_105"), 10),
    ("fuzzy", Fuzzy(term="impord", max_distance=1), 10),
    ("phrase_hotpair", Phrase(terms=("import", "int")), 10),
    ("phrase_uniq", Phrase(terms=("uniq_3_a", "uniq_3_b")), 10),
    ("boosted_or", Or(children=(TermF(term="sym_5", boost=2.0),
                                TermF(term="sym_6"))), 10),
    ("all_docs", All(), 5),
    (
        "nested",
        And(children=(
            Or(children=(TermF(term="import"), TermF(term="void"))),
            TermsF(terms=("sym_2", "sym_3"), min_match=1),
        )),
        10,
    ),
]


def _collect(df):
    return [
        (r["repo"], r["path"], r["commit"], r["score"], r["segment_id"], r["doc_id"])
        for r in df.collect()
    ]


@pytest.mark.parametrize("name,query,k", QUERIES, ids=[q[0] for q in QUERIES])
def test_rank_identity(engine, oracle, name, query, k):
    got = _collect(engine.search(query, k=k, wand=True))
    exp = oracle.search(query, k=k)
    assert len(got) == len(exp), f"{name}: row count {len(got)} != {len(exp)}"
    for i, (g, e) in enumerate(zip(got, exp)):
        assert g[:3] == e[:3], f"{name} rank {i}: doc {g[:3]} != {e[:3]}"
        assert np.float32(g[3]) == np.float32(e[3]), (
            f"{name} rank {i}: score {g[3]!r} != {e[3]!r}"
        )
        assert (g[4], g[5]) == (e[4], e[5])


@pytest.mark.parametrize(
    "query,k",
    [
        (TermF(term="import"), 10),
        (Or(children=(TermF(term="import"), TermF(term="sym_9"),
                      TermF(term="sym_500"))), 25),
        (Or(children=(TermF(term="void"), TermF(term="uniq_5_a"))), 10),
        # non-sum merges now take the WAND path too (sum-of-bounds stays a
        # safe upper bound for max/min)
        (Or(children=(TermF(term="import"), TermF(term="void")),
            merge_type="max"), 10),
        (Or(children=(TermF(term="import"), TermF(term="void")),
            merge_type="min"), 10),
        # boolean trees: And of flat term nodes uses block-skip + threshold
        # pruning (wand_and) and must stay bit-identical to exhaustive
        (And(children=(TermF(term="import"),
                       Or(children=(TermF(term="void"),
                                    TermF(term="sym_9"))))), 10),
        (And(children=(TermF(term="import"), TermF(term="void"),
                       TermF(term="sym_2"))), 5),
        # min_match > 1 child now rides wand_and (counts thread through
        # eval_masked) and must stay bit-identical
        (And(children=(TermF(term="import"),
                       TermsF(terms=("sym_2", "sym_3"), min_match=2))), 10),
        # single positive child + exclude: stays exhaustive (no pruning
        # value), but must stay exact
        (And(children=(TermF(term="import"),
                       Not(child=TermF(term="void")))), 10),
        # r5: top-level min_match>1 disjunction takes the WAND path
        (TermsF(terms=("import", "void", "sym_9"), min_match=2), 10),
        (TermsF(terms=("import", "void", "sym_9", "sym_500"),
                min_match=3), 25),
        # r5: Or-of-And mixed tree (wanderator-inside-boolean analogue)
        (Or(children=(And(children=(TermF(term="import"),
                                    TermF(term="sym_2"))),
                      TermF(term="uniq_5_a"))), 10),
        # r5: Or with min_match=2 over subtree children
        (Or(children=(TermF(term="import"), TermF(term="void"),
                      TermF(term="sym_9")), min_match=2), 10),
        # r5: conjunction with an exclude and >=2 positive children rides
        # wand_and (exclude filtered from the lead pre-bootstrap)
        (And(children=(TermF(term="import"), TermF(term="void"),
                       Not(child=TermF(term="sym_2")))), 10),
        # r5: min_match disjunction nested under a conjunction
        (And(children=(TermsF(terms=("sym_2", "sym_3", "sym_4"),
                              min_match=2),
                       TermF(term="import"))), 10),
    ],
)
def test_wand_equals_exhaustive(engine, query, k):
    w = _collect(engine.search(query, k=k, wand=True))
    e = _collect(engine.search(query, k=k, wand=False))
    assert w == e


@pytest.mark.parametrize(
    "scorer_name", ["bm15", "bm11", "tfidf", "tfidf_norms", "bm25_k_half"]
)
def test_wand_equals_exhaustive_other_scorers(spark, engine, scorer_name):
    """WandTestCase TermFilterBM15/BM11/TFIDF(+norms)
    (`wand_test.cpp:501-553`): the block-max bounds must stay valid upper
    bounds — WAND top-k bit-identical to exhaustive — under every scorer
    the wanderator serves, not just default BM25."""
    from iresearch_spark.search.scorers import BM25, TFIDF

    scorer = {
        "bm15": BM25(b=0.0),
        "bm11": BM25(b=1.0),
        "tfidf": TFIDF(),
        "tfidf_norms": TFIDF(with_norms=True),
        "bm25_k_half": BM25(k=0.5),
    }[scorer_name]
    eng = SearchEngine(spark, engine.index_dir, scorer=scorer)
    try:
        queries = (
            TermF(term="import"),
            Or(children=(TermF(term="import"), TermF(term="void"),
                         TermF(term="sym_9"))),
            TermsF(terms=("import", "void", "sym_9"), min_match=2),
            And(children=(TermF(term="import"), TermF(term="void"))),
        )
        for q in queries:
            w = _collect(eng.search(q, k=10, wand=True))
            e = _collect(eng.search(q, k=10, wand=False))
            assert w == e, (scorer_name, q)
    finally:
        eng.close()
