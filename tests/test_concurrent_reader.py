"""Concurrent-reader soak (r4 verdict #7): the engine is a long-lived
service shape (LRU caches, stamp invalidation, close()), so exercise
queries RACING a manifest publish and assert (a) no stale reads after the
publish — the stamp check must drop proxy match sets, term stats, and the
packed-norms blob — and (b) no leaked persisted DataFrames once the engine
closes. The reference's analogue is a reader reopening across a commit
(`index_reader.hpp:35-153`) while search threads hold the old snapshot."""

import threading
from concurrent.futures import ThreadPoolExecutor

import pytest

from iresearch_spark.index import build_index
from iresearch_spark.search import Or, Proxy, SearchEngine, TermF

SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def _rows(n):
    return [
        ("r", f"{i:04d}.py", "c", "py", f"alpha beta gamma doc{i}")
        for i in range(n)
    ]


def _persisted_count(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


@pytest.fixture()
def soak_index(spark, tmp_path):
    d = str(tmp_path / "idx_soak")
    build_index(
        spark, spark.createDataFrame(_rows(300), SCHEMA), d, num_segments=4
    )
    return d


def test_queries_racing_a_delete_publish(spark, soak_index):
    """Readers hammer term + proxy queries from worker threads while the
    main thread publishes a delete generation. Every result collected
    AFTER the publish returns must exclude the tombstoned doc, and the
    proxy cache must have re-materialized (stamp fired)."""
    from iresearch_spark.index.deletes import mark_deleted

    eng = SearchEngine(spark, soak_index)
    q_term = TermF(term="alpha")
    q_proxy = Proxy(child=Or(children=(TermF(term="alpha"),
                                       TermF(term="beta"))))
    # prime every cache: norms blob, term stats, proxy match set
    assert eng.search(q_term, k=None).count() == 300
    assert eng.search(q_proxy, k=None).count() == 300

    published = threading.Event()
    errors: list[Exception] = []

    def reader(i: int) -> None:
        try:
            for _ in range(6):
                # snapshot semantics: only a search STARTED after the
                # publish returned must see the new mask (a collect in
                # flight across the publish legitimately serves the old
                # snapshot, like a reader holding the previous directory
                # snapshot in the reference)
                started_after = published.is_set()
                q = q_proxy if i % 2 else q_term
                rows = eng.search(q, k=None).collect()
                paths = {r["path"] for r in rows}
                if started_after:
                    # post-publish reads must never serve the tombstone
                    assert "0042.py" not in paths, "stale read after publish"
                    assert len(rows) == 299
        except Exception as e:  # surface across the thread boundary
            errors.append(e)

    with ThreadPoolExecutor(max_workers=4) as pool:
        futs = [pool.submit(reader, i) for i in range(4)]
        keys = spark.createDataFrame(
            [("r", "0042.py", "c")],
            "repo string, path string, commit string",
        )
        n = mark_deleted(spark, soak_index, keys)
        assert n == 1
        published.set()
        for f in futs:
            f.result()
    assert not errors, errors

    # and the main thread's post-publish view agrees
    rows = eng.search(q_proxy, k=None).collect()
    assert len(rows) == 299
    assert all(r["path"] != "0042.py" for r in rows)
    eng.close()


def test_stats_refresh_across_incremental_publish(spark, soak_index):
    """A new commit (incremental batch) changes GLOBAL BM25 stats; a
    long-lived engine must serve post-publish queries with the new
    docs_with_field/avgdl — a fresh engine on the same index is the oracle
    (scores must match exactly, not just ranks)."""
    from iresearch_spark.streaming.incremental import IncrementalIndexer

    eng = SearchEngine(spark, soak_index)
    before = [tuple(r) for r in eng.search(TermF(term="alpha"), k=5).collect()]
    assert len(before) == 5

    idx = IncrementalIndexer(spark, soak_index, segments_per_batch=2)
    extra = [
        ("r2", f"{i:04d}.py", "c", "py", f"alpha delta extra{i}")
        for i in range(50)
    ]
    idx.process_batch(spark.createDataFrame(extra, SCHEMA), batch_id=1)

    after = [tuple(r) for r in eng.search(TermF(term="alpha"), k=None).collect()]
    fresh = SearchEngine(spark, soak_index)
    oracle = [
        tuple(r) for r in fresh.search(TermF(term="alpha"), k=None).collect()
    ]
    assert len(after) == 350
    assert after == oracle, "stale global stats after publish"
    eng.close()
    fresh.close()


def test_no_leaked_persisted_dataframes(spark, soak_index):
    """Engine resources (norms blob, proxy match sets) must all unpersist
    on close() even after cache-churning publishes mid-life."""
    from iresearch_spark.index.deletes import mark_deleted

    base = _persisted_count(spark)
    eng = SearchEngine(spark, soak_index)
    q_proxy = Proxy(child=TermF(term="beta"))
    eng.search(TermF(term="alpha"), k=5).count()
    eng.search(q_proxy, k=5).count()
    assert _persisted_count(spark) > base  # norms blob + proxy set pinned
    keys = spark.createDataFrame(
        [("r", "0007.py", "c")], "repo string, path string, commit string"
    )
    mark_deleted(spark, soak_index, keys)
    eng.search(q_proxy, k=5).count()  # re-materialize under the new mask
    eng.close()
    assert _persisted_count(spark) == base, "leaked persisted DataFrames"
