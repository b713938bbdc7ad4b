"""nested_match (ByNestedFilter match modes, nested_filter.hpp:33-120) and
the legacy `Norm` BM25 variant (bm25.hpp:38-43: tf=sqrt(freq), |doc|=sqrt(dl))."""

import math

import pytest

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.build import build_index
from iresearch_spark.search import BM25, Or, SearchEngine, TermF, nested_match

# ------------------------------------------------------------- nested_match

PARENTS = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
# parent 1: 3 children, parent 2: 1 child, parent 3: 0, parent 4: 2
CHILDREN = [
    (1, 10.0), (1, 30.0), (1, 20.0),
    (2, 5.0),
    (4, 7.0), (4, 9.0),
]


@pytest.fixture(scope="module")
def tables(spark):
    p = spark.createDataFrame(PARENTS, ["pid", "tag"])
    c = spark.createDataFrame(CHILDREN, ["cid", "v"])
    return p, c


def _rows(df):
    return sorted((r["pid"], r["n_children"]) for r in df.collect())


def test_match_any(tables):
    p, c = tables
    out = nested_match(p, c, "pid", "cid")  # lo=1, hi=None == kMatchAny
    assert _rows(out) == [(1, 3), (2, 1), (4, 2)]


def test_match_none(tables):
    p, c = tables
    out = nested_match(p, c, "pid", "cid", lo=0, hi=0)  # kMatchNone
    assert _rows(out) == [(3, 0)]


def test_match_range(tables):
    p, c = tables
    out = nested_match(p, c, "pid", "cid", lo=2, hi=3)
    assert _rows(out) == [(1, 3), (4, 2)]


def test_match_range_lo_zero_includes_empty(tables):
    p, c = tables
    out = nested_match(p, c, "pid", "cid", lo=0, hi=1)
    assert _rows(out) == [(2, 1), (3, 0)]


@pytest.mark.parametrize(
    "merge,expect",
    [("sum", 60.0), ("max", 30.0), ("min", 10.0), ("avg", 20.0)],
)
def test_score_merge(tables, merge, expect):
    from pyspark.sql import functions as F

    p, c = tables
    out = nested_match(p, c, "pid", "cid", child_score=F.col("v"), merge=merge)
    got = {r["pid"]: r["child_score"] for r in out.collect()}
    assert got[1] == expect


def test_bad_range_raises(tables):
    p, c = tables
    with pytest.raises(ValueError):
        nested_match(p, c, "pid", "cid", lo=3, hi=1)


# -------------------------------------------------------------- legacy norm

N_DOCS = 300


@pytest.fixture(scope="module")
def built(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_legacy"))
    corpus = generate_corpus(spark, N_DOCS, num_partitions=4)
    build_index(spark, corpus, d, num_segments=3)
    return d


def _doc_tf_dl(term):
    """Independent stats from the deterministic corpus (same generator the
    index was built from), tokenized by the independent test oracle's
    regex — no engine code involved."""
    from iresearch_spark.corpus import make_corpus_pdf
    from tests.oracle import TOKEN_RE

    pdf = make_corpus_pdf(N_DOCS)
    tf: dict[str, int] = {}
    dl: dict[str, int] = {}
    for row in pdf.itertuples(index=False):
        toks = TOKEN_RE.findall(row.content.lower())
        dl[row.path] = len(toks)
        c = sum(1 for t in toks if t == term)
        if c:
            tf[row.path] = c
    n = len(dl)
    avgdl = sum(dl.values()) / n
    return tf, dl, n, avgdl


def test_legacy_norm_scores_match_independent_formula(spark, built):
    term = "import"
    eng = SearchEngine(spark, built, scorer=BM25(norm="legacy"))
    res = {
        r["path"]: r["score"]
        for r in eng.search(TermF(term=term), k=None, dtype="float64").collect()
    }
    tf, dl, n, avgdl = _doc_tf_dl(term)
    df = len(tf)
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    c0 = 2.2 * idf
    assert res, "term must match"
    assert set(res) == set(tf)
    for key, freq in tf.items():
        c1 = (1.2 - 1.2 * 0.75) + (1.2 * 0.75 / avgdl) * math.sqrt(dl[key])
        expect = c0 - c0 * c1 / (c1 + math.sqrt(freq))
        assert res[key] == pytest.approx(expect, rel=1e-9), key


def test_legacy_norm_wand_equals_exhaustive(spark, built):
    q = Or(children=(TermF(term="import"), TermF(term="void")))
    eng = SearchEngine(spark, built, scorer=BM25(norm="legacy"))
    wand = [
        (r["segment_id"], r["doc_id"], r["score"])
        for r in eng.search(q, k=10, wand=True).collect()
    ]
    exact = [
        (r["segment_id"], r["doc_id"], r["score"])
        for r in eng.search(q, k=10, wand=False).collect()
    ]
    assert wand == exact


def test_legacy_differs_from_norm2(spark, built):
    eng2 = SearchEngine(spark, built, scorer=BM25())
    engl = SearchEngine(spark, built, scorer=BM25(norm="legacy"))
    s2 = eng2.search(TermF(term="import"), k=5).collect()
    sl = engl.search(TermF(term="import"), k=5).collect()
    assert [r["score"] for r in s2] != [r["score"] for r in sl]
