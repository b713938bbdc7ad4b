"""Point-in-time reads: any retained committed generation reopens exactly as
it was published (`core/index/index_reader.hpp:35-153` — the reference can
reopen any ``segments_N`` still on disk). Here each manifest publish retains
a numbered copy under ``generations/``; ``SearchEngine(generation=N)`` pins
every scan to that snapshot's segment set, so pre-merge segments kept with
``merge_segments(cleanup=False)`` read exactly as committed."""

import pytest
from pyspark.sql import functions as F

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.build import build_index
from iresearch_spark.index.manifest import list_generations, read_manifest
from iresearch_spark.index.merge import merge_segments
from iresearch_spark.search import SearchEngine, TermF

N_DOCS = 160


def _corpus(spark):
    return generate_corpus(spark, N_DOCS, num_partitions=3, min_tokens=20,
                           max_tokens=120)


def _ident_scores(eng, term="import"):
    rows = eng.search(TermF(term=term), k=None, dtype="float64").collect()
    return sorted((r["repo"], r["path"], r["commit"], round(r["score"], 6))
                  for r in rows)


def test_wave_generations_are_snapshots(spark, tmp_path):
    """A 2-wave build commits twice; generation 1 sees only wave-1 segments."""
    d = str(tmp_path / "idx")
    build_index(spark, _corpus(spark), d, num_segments=4, waves=2)
    gens = list_generations(d)
    assert gens == [1, 2]
    m1 = read_manifest(d, generation=1)
    m2 = read_manifest(d, generation=2)
    assert len(m1.segments) == 2 and len(m2.segments) == 4

    old = SearchEngine(spark, d, generation=1)
    new = SearchEngine(spark, d)  # latest == generation 2
    r_old = _ident_scores(old)
    r_new = _ident_scores(new)
    ids_old = {t[:3] for t in r_old}
    ids_new = {t[:3] for t in r_new}
    assert ids_old and ids_old < ids_new  # strict subset: wave-2 invisible
    # within gen-1's segment universe, stats are gen-1-global: docmeta count
    # matches the pinned manifest, not the directory
    assert old.docmeta_df().count() == sum(s["docs"] for s in m1.segments)
    assert new.docmeta_df().count() == N_DOCS


def test_pre_merge_generation_reopens(spark, tmp_path):
    """After a merge retained with cleanup=False, the pre-merge generation
    returns the byte-same result set (identity + score); the post-merge
    engine returns the same logical results under new segment ids."""
    d = str(tmp_path / "idx")
    build_index(spark, _corpus(spark), d, num_segments=4)
    pre_gen = list_generations(d)[-1]
    pre = _ident_scores(SearchEngine(spark, d))

    merge_segments(spark, d, [0, 1, 2, 3], cleanup=False)
    assert list_generations(d)[-1] == pre_gen + 1

    post = _ident_scores(SearchEngine(spark, d))
    pit = _ident_scores(SearchEngine(spark, d, generation=pre_gen))
    assert post == pre  # merge preserves results (global stats identical)
    assert pit == pre  # the retained snapshot reads exactly as committed
    # PIT manifest still lists the original segments
    assert [s["segment_id"] for s in
            read_manifest(d, generation=pre_gen).segments] == [0, 1, 2, 3]


def test_missing_generation_raises(spark, tmp_path):
    d = str(tmp_path / "idx")
    build_index(spark, _corpus(spark), d, num_segments=2)
    with pytest.raises(FileNotFoundError, match="generation 99"):
        SearchEngine(spark, d, generation=99)


def test_pinned_generation_proxy_sees_delete_publish(spark, tmp_path):
    """Deletes are unversioned (the mask is always current), and a
    mark_deleted publish rewrites manifest.json but never the retained
    gen-N file — a generation-pinned engine's proxy cache must still be
    invalidated, or Proxy queries keep serving the tombstoned doc while
    direct queries on the same engine drop it."""
    from iresearch_spark.index.deletes import mark_deleted
    from iresearch_spark.search import Proxy

    d = str(tmp_path / "idx")
    build_index(spark, _corpus(spark), d, num_segments=4, waves=2)

    old = SearchEngine(spark, d, generation=1)
    q = TermF(term="import")

    def rows(df):
        return sorted(
            (r["repo"], r["path"], r["commit"]) for r in df.collect()
        )

    before = rows(old.search(Proxy(child=q), k=None))
    assert before
    victim = before[0]
    mark_deleted(
        spark, d, spark.createDataFrame([victim], ["repo", "path", "commit"])
    )
    after = rows(old.search(Proxy(child=q), k=None))
    direct = rows(old.search(q, k=None))
    assert victim not in after
    assert after == direct


def test_prune_generations_keeps_newest_and_live_manifest(spark, tmp_path):
    from iresearch_spark.index.manifest import prune_generations

    d = str(tmp_path / "idx")
    build_index(spark, _corpus(spark), d, num_segments=4, waves=4)
    assert list_generations(d) == [1, 2, 3, 4]
    pruned = prune_generations(d, keep=2)
    assert pruned == [1, 2]
    assert list_generations(d) == [3, 4]
    # the live manifest still opens; pruned PIT reads raise
    assert SearchEngine(spark, d).search(TermF(term="import"), k=5).count() >= 0
    with pytest.raises(FileNotFoundError):
        read_manifest(d, generation=1)
    # generation 3 still reopens
    assert read_manifest(d, generation=3) is not None


def test_live_engine_sees_new_commits_and_merges(spark, tmp_path):
    """A long-lived (non-pinned) engine must reload its segment view and
    global BM25 stats on any manifest publish: new commits become visible
    and a consolidation with cleanup=True never leaves the engine pointing
    at deleted segment files. (Generation-pinned engines keep their
    immutable snapshot — covered by the tests above.)"""
    d = str(tmp_path / "idx")
    build_index(spark, _corpus(spark), d, num_segments=4, waves=2)
    eng = SearchEngine(spark, d)
    n_before = len(_ident_scores(eng))
    assert n_before > 0

    # publish a new commit through the incremental path: +40 docs
    from iresearch_spark.streaming.incremental import IncrementalIndexer

    extra = generate_corpus(spark, 40, num_partitions=1, min_tokens=20,
                            max_tokens=120).withColumn(
        "repo", F.concat(F.lit("late/"), F.col("repo"))
    )
    IncrementalIndexer(spark, d, segments_per_batch=2).process_batch(extra, 1)
    rows_after_commit = _ident_scores(eng)
    assert len(rows_after_commit) > n_before  # new docs visible
    assert any(r[0].startswith("late/") for r in rows_after_commit)

    # consolidate (cleanup=True default): merged-away segment files are DELETED;
    # the same engine object must reload and return the identical result
    from iresearch_spark.index.merge import consolidate

    res = consolidate(spark, d, max_bytes=1 << 40, max_skew=1.0)
    assert res
    rows_after_merge = _ident_scores(eng)
    assert rows_after_merge == rows_after_commit
