"""Document deletion masks + purge-on-merge (the reference's delete model:
masks never touch segment data; consolidation purges and re-numbers)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index import (
    build_index,
    deletion_ratio,
    mark_deleted,
    merge_segments,
    plan_cleanup,
    read_manifest,
)
from iresearch_spark.search import Or, SearchEngine, TermF

N_DOCS = 300
QUERY = Or(children=(TermF(term="import"), TermF(term="return")))


def _results(spark, index_dir, wand=True):
    eng = SearchEngine(spark, index_dir)
    return [
        (r["repo"], r["path"], r["commit"], np.float32(r["score"]))
        for r in eng.search(QUERY, k=50, wand=wand).collect()
    ]


@pytest.fixture()
def fresh_index(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, generate_corpus(spark, N_DOCS, 4), d, num_segments=4)
    return d


def test_masked_docs_disappear_scores_unchanged(spark, fresh_index):
    before = _results(spark, fresh_index)
    victims = [before[0], before[2], before[5]]
    keys = spark.createDataFrame(
        [(v[0], v[1], v[2]) for v in victims], ["repo", "path", "commit"]
    )
    n = mark_deleted(spark, fresh_index, keys)
    assert n == 3
    after = _results(spark, fresh_index)
    victim_ids = {v[:3] for v in victims}
    assert all(r[:3] not in victim_ids for r in after)
    # stats untouched before consolidation -> survivors keep exact scores
    # (new docs enter at the tail to refill k)
    exp = [r for r in before if r[:3] not in victim_ids]
    assert after[: len(exp)] == exp
    assert len(after) == 50
    # idempotent: re-deleting the same keys adds nothing
    assert mark_deleted(spark, fresh_index, keys) == 0


def test_wand_respects_masks(spark, fresh_index):
    before = _results(spark, fresh_index)
    keys = spark.createDataFrame(
        [tuple(before[0][:3])], ["repo", "path", "commit"]
    )
    mark_deleted(spark, fresh_index, keys)
    assert _results(spark, fresh_index, wand=True) == _results(
        spark, fresh_index, wand=False
    )


def test_merge_purges_and_matches_fresh_live_build(spark, tmp_path):
    d = str(tmp_path / "idx")
    corpus = generate_corpus(spark, N_DOCS, 4).cache()
    build_index(spark, corpus, d, num_segments=3)
    # delete every doc whose path hashes to a third of the space
    victims = corpus.filter(F.pmod(F.crc32("path"), F.lit(3)) == 0).select(
        "repo", "path", "commit"
    )
    n_victims = victims.count()
    mark_deleted(spark, d, victims)
    merge_segments(spark, d, [0, 1, 2])
    m = read_manifest(d)
    assert len(m.segments) == 1
    seg = m.segments[0]
    assert seg["docs"] == N_DOCS - n_victims
    # dense renumbering: doc ids are exactly 1..live
    ids = sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{d}/docmeta").select("doc_id").collect()
    )
    assert ids == list(range(1, N_DOCS - n_victims + 1))
    # a fresh index over only the live docs must give identical results
    d2 = str(tmp_path / "idx_fresh")
    live = corpus.join(victims, ["repo", "path", "commit"], "anti")
    build_index(spark, live, d2, num_segments=3)
    got = _results(spark, d)
    exp = _results(spark, d2)
    assert got == exp
    corpus.unpersist()


def test_cleanup_policy(spark, fresh_index):
    m = read_manifest(fresh_index)
    assert plan_cleanup(m.segments) == []
    # delete most docs of segment 0
    dm = spark.read.parquet(f"{fresh_index}/docmeta")
    seg0 = dm.filter(F.col("segment_id") == 0).select("repo", "path", "commit")
    mark_deleted(spark, fresh_index, seg0)
    m2 = read_manifest(fresh_index)
    s0 = [s for s in m2.segments if s["segment_id"] == 0][0]
    assert deletion_ratio(s0) == 1.0
    assert plan_cleanup(m2.segments) == [0]
