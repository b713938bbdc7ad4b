"""Physical-plan regression guards.

These assert the *shape* of the plans — the properties that keep the engine
fast at scale and that profiling can't catch on toy data:

- the term predicate reaches the postings parquet scan (PushedFilters), so
  a 100 TB segments table reads only the matching row groups;
- a non-positional query prunes the positions column out of the scan;
- the docmeta identity join broadcasts only the bounded top-k side; the
  unbounded all-matches side (k=None) must NOT carry a broadcast hint.
"""

import io
from contextlib import redirect_stdout

import pytest

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index import build_index
from iresearch_spark.search import Phrase, SearchEngine, TermF


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx") / "plan")
    build_index(spark, generate_corpus(spark, 120, 2), d, num_segments=2)
    return SearchEngine(spark, d)


def _formatted(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_term_predicate_pushed_to_postings_scan(engine):
    plan = _formatted(engine.search(TermF(term="import"), k=None))
    assert "PushedFilters" in plan
    # the term shows up inside a pushed In/EqualTo on the postings scan
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert any("term" in line for line in pushed), pushed


def test_positions_column_pruned_unless_phrase(engine):
    plan = _formatted(engine.search(TermF(term="import"), k=None))
    read_schemas = [
        line for line in plan.splitlines() if "ReadSchema" in line
    ]
    seg_reads = [line for line in read_schemas if "postings" in line]
    assert seg_reads and all("positions" not in line for line in seg_reads), (
        read_schemas
    )
    plan_ph = _formatted(
        engine.search(Phrase(terms=("fast", "key")), k=None)
    )
    seg_reads_ph = [
        line
        for line in plan_ph.splitlines()
        if "ReadSchema" in line and "postings" in line
    ]
    assert any("positions" in line for line in seg_reads_ph), seg_reads_ph


def test_identity_join_broadcasts_only_bounded_topk(engine):
    bounded = _optimized(engine.search(TermF(term="import"), k=5))
    unbounded = _optimized(engine.search(TermF(term="import"), k=None))
    assert "strategy=broadcast" in bounded, bounded[-500:]
    assert "strategy=broadcast" not in unbounded, unbounded[-500:]
