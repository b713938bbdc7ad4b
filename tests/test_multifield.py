"""Multi-field indexing: N fields per doc (`core/index/segment_writer.hpp:
91-119`, `field_meta.hpp:46-62`): per-field postings, per-field norms
(docmeta dl columns), per-field global stats in the manifest.

Checks:
- a field query on the multi-field index scores identically to the same
  query on a single-field index built over just that column;
- cross-field conjunction = doc intersection with per-field BM25 summed;
- consolidation (merge) preserves multi-field data and stats.
"""

import numpy as np
import pytest

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.build import build_index
from iresearch_spark.index.manifest import read_manifest
from iresearch_spark.index.merge import consolidate
from iresearch_spark.search import And, ExistsF, Fuzzy, SearchEngine, TermF

N_DOCS = 200
N_SEGMENTS = 3
FIELDS = [("content", "code"), ("lang", "code")]


def _collect(engine, filt, **kw):
    rows = engine.search(filt, k=None, **kw).collect()
    return {
        (r["segment_id"], r["doc_id"]): r["score"] for r in rows
    }


@pytest.fixture(scope="module")
def corpus(spark):
    return generate_corpus(spark, N_DOCS, num_partitions=4, min_tokens=30,
                           max_tokens=200)


@pytest.fixture(scope="module")
def multi_engine(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_multi"))
    build_index(spark, corpus, d, num_segments=N_SEGMENTS, fields=FIELDS)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def content_engine(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_content"))
    build_index(spark, corpus, d, num_segments=N_SEGMENTS)
    return SearchEngine(spark, d)


@pytest.fixture(scope="module")
def lang_engine(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_lang"))
    build_index(spark, corpus, d, num_segments=N_SEGMENTS, field="lang",
                analyzer="code")
    return SearchEngine(spark, d)


def test_manifest_declares_fields(multi_engine):
    m = multi_engine.manifest
    assert m.field_specs() == FIELDS
    assert "lang" in multi_engine.field_stats
    dwf, ttf = multi_engine.field_stats["lang"]
    assert dwf == N_DOCS  # every doc has a lang token
    assert ttf == N_DOCS  # exactly one token per doc


def test_primary_field_scores_unchanged(multi_engine, content_engine):
    q = TermF(term="import")
    assert _collect(multi_engine, q) == _collect(content_engine, q)


def test_secondary_field_matches_dedicated_index(multi_engine, lang_engine):
    q_multi = TermF(field_name="lang", term="python")
    q_single = TermF(term="python")  # lang_engine's primary IS lang
    got = _collect(multi_engine, q_multi)
    want = _collect(lang_engine, q_single)
    assert got == want
    assert len(got) > 0


def test_cross_field_conjunction_sums_scores(multi_engine):
    qa = TermF(term="import")
    qb = TermF(field_name="lang", term="python")
    sa = _collect(multi_engine, qa, dtype="float64")
    sb = _collect(multi_engine, qb, dtype="float64")
    both = _collect(
        multi_engine, And(children=(qa, qb)), dtype="float64"
    )
    assert set(both) == set(sa) & set(sb)
    for key, s in both.items():
        assert np.isclose(s, sa[key] + sb[key], rtol=1e-12)


def test_exists_on_secondary_field(multi_engine):
    rows = _collect(multi_engine, ExistsF(field_name="lang"))
    assert len(rows) == N_DOCS


def test_fuzzy_on_secondary_field(multi_engine, lang_engine):
    q_multi = Fuzzy(field_name="lang", term="pythn", max_distance=1)
    q_single = Fuzzy(term="pythn", max_distance=1)
    assert _collect(multi_engine, q_multi) == _collect(lang_engine, q_single)


def test_merge_preserves_fields(spark, corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_multi_merge"))
    build_index(spark, corpus, d, num_segments=N_SEGMENTS, fields=FIELDS)
    eng0 = SearchEngine(spark, d)
    q = TermF(field_name="lang", term="python")
    # snapshot semantics: eng0 pins the pre-merge manifest, and consolidate's
    # cleanup purges the merged-away segment data (no reader refcount keeps
    # it alive, unlike index_reader.hpp) — so the baseline must be collected
    # BEFORE the merge, while eng0's segments still exist on disk
    before_by_path = {
        r["path"]: r["score"]
        for r in eng0.search(q, k=None).collect()
    }
    res = consolidate(spark, d, max_bytes=1 << 40, max_skew=1.0)
    assert res, "expected at least one merge"
    m = read_manifest(d)
    assert m.field_specs() == FIELDS
    eng1 = SearchEngine(spark, d)
    after = {
        doc_path: s
        for doc_path, s in (
            (r["path"], r["score"])
            for r in eng1.search(q, k=None).collect()
        )
    }
    assert after == before_by_path
    # per-field stats survive the merge
    assert eng1.field_stats["lang"] == eng0.field_stats["lang"]
