"""Engine-level edge cases: multi-block posting lists (real WAND block
skipping), empty/single-doc corpora, high term frequencies."""

import numpy as np
import pandas as pd
import pytest

from iresearch_spark.corpus import generate_corpus, make_corpus_pdf
from iresearch_spark.index.build import build_index
from iresearch_spark.search import Or, SearchEngine, TermF
from tests.oracle import OracleEngine

N_DOCS = 500  # ONE segment -> hot terms have 400+ doc posting lists (>3 blocks)


@pytest.fixture(scope="module")
def big_engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_blocks"))
    corpus = generate_corpus(spark, N_DOCS, num_partitions=4, min_tokens=200,
                             max_tokens=400)
    build_index(spark, corpus, d, num_segments=1)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def big_oracle():
    return OracleEngine(
        make_corpus_pdf(N_DOCS, min_tokens=200, max_tokens=400), 1
    )


def test_multiblock_posting_lists_exist(big_engine):
    seg = big_engine.spark.read.parquet(f"{big_engine.index_dir}/segments")
    from pyspark.sql import functions as F

    n_blocks = seg.select(F.max(F.size("last_docs")).alias("b")).first()["b"]
    assert n_blocks >= 3  # real multi-block lists -> WAND skipping is live


@pytest.mark.parametrize("k", [5, 10, 50])
def test_wand_multiblock_rank_identity(big_engine, big_oracle, k):
    q = Or(children=(TermF(term="import"), TermF(term="int"),
                     TermF(term="sym_40")))
    got = [
        (r["repo"], r["path"], np.float32(r["score"]))
        for r in big_engine.search(q, k=k, wand=True).collect()
    ]
    exp = [(e[0], e[1], np.float32(e[3])) for e in big_oracle.search(q, k=k)]
    assert got == exp


def test_wand_multiblock_equals_exhaustive(big_engine):
    q = Or(children=(TermF(term="import"), TermF(term="the"),
                     TermF(term="uniq_3_a")))
    w = [tuple(r) for r in big_engine.search(q, k=20, wand=True).collect()]
    e = [tuple(r) for r in big_engine.search(q, k=20, wand=False).collect()]
    assert w == e


def test_empty_corpus_build_and_search(spark, tmp_path):
    d = str(tmp_path / "idx")
    from iresearch_spark.corpus import CORPUS_SCHEMA

    empty = spark.createDataFrame([], schema=CORPUS_SCHEMA)
    m = build_index(spark, empty, d, num_segments=2)
    assert m["docs"] == 0
    eng = SearchEngine(spark, d)
    assert eng.search(TermF(term="anything"), k=10).count() == 0


def test_single_doc_corpus(spark, tmp_path):
    d = str(tmp_path / "idx")
    pdf = pd.DataFrame(
        {"repo": ["r"], "path": ["p"], "commit": ["c"], "lang": ["t"],
         "content": ["hello world hello"]}
    )
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=4)
    eng = SearchEngine(spark, d)
    hits = eng.search(TermF(term="hello"), k=5).collect()
    assert len(hits) == 1
    assert hits[0]["doc_id"] == 1


def test_high_term_frequency(spark, tmp_path):
    """freq > 255 exercises multi-byte varint freqs and norm interplay."""
    d = str(tmp_path / "idx")
    pdf = pd.DataFrame(
        {"repo": ["r", "r"], "path": ["a", "b"], "commit": ["c1", "c2"],
         "lang": ["t", "t"],
         "content": ["spam " * 300 + "rare", "spam normal words"]}
    )
    build_index(spark, spark.createDataFrame(pdf), d, num_segments=1)
    eng = SearchEngine(spark, d)
    hits = eng.search(TermF(term="spam"), k=5, with_identity=False).collect()
    assert len(hits) == 2
    seg = spark.read.parquet(f"{d}/segments")
    row = seg.filter(seg.term == "spam").first()
    assert row["total_tf"] == 301
