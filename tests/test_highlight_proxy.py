"""Proxy (cached) filter + highlighting offsets."""

import pandas as pd
import pytest

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.build import build_index
from iresearch_spark.search import (
    Or,
    Proxy,
    SearchEngine,
    TermF,
    highlight_matches,
    tokenize_with_offsets,
)

N_DOCS = 120


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_proxy"))
    corpus = generate_corpus(spark, N_DOCS, num_partitions=2, min_tokens=30,
                             max_tokens=200).cache()
    build_index(spark, corpus, d, num_segments=2)
    return SearchEngine(spark, d), corpus


def _rows(df):
    return [
        (r["repo"], r["path"], r["commit"], r["score"]) for r in df.collect()
    ]


def test_proxy_identical_results_and_cache_hit(setup):
    eng, _ = setup
    q = Or(children=(TermF(term="import"), TermF(term="sym_9")))
    want = _rows(eng.search(q, k=15))
    assert eng.proxy_hits == 0
    got1 = _rows(eng.search(Proxy(child=q), k=15))
    assert got1 == want
    assert eng.proxy_hits == 0  # first run fills the cache
    got2 = _rows(eng.search(Proxy(child=q), k=5))
    assert got2 == want[:5]
    assert eng.proxy_hits == 1  # second run served from cache
    eng.clear_proxy_cache()


def test_proxy_cache_invalidated_by_manifest_publish(spark, tmp_path):
    """A delete publishes a new manifest generation; the proxy cache must
    drop its snapshot instead of serving tombstoned docs forever."""
    from pyspark.sql import functions as F

    from iresearch_spark.index.deletes import mark_deleted

    d = str(tmp_path / "idx_proxy_inval")
    corpus = generate_corpus(spark, 60, num_partitions=2, min_tokens=30,
                             max_tokens=120)
    build_index(spark, corpus, d, num_segments=2)
    eng = SearchEngine(spark, d)
    q = TermF(term="import")
    before = _rows(eng.search(Proxy(child=q), k=None))
    assert before
    victim = before[0][:3]
    mark_deleted(
        spark, d,
        spark.createDataFrame([victim], ["repo", "path", "commit"]),
    )
    after = _rows(eng.search(Proxy(child=q), k=None))
    direct = _rows(eng.search(q, k=None))
    assert victim not in {r[:3] for r in after}
    assert after == direct  # proxy == fresh execution post-publish
    eng.clear_proxy_cache()


def test_proxy_boost_scales_scores(setup):
    eng, _ = setup
    q = TermF(term="import")
    base = _rows(eng.search(Proxy(child=q), k=5))
    boosted = _rows(eng.search(Proxy(boost=2.0, child=q), k=5))
    for (b, x) in zip(base, boosted):
        assert abs(x[3] - 2.0 * b[3]) < 1e-5
    eng.clear_proxy_cache()


def test_tokenize_with_offsets_code():
    text = "Import x; import y_2"
    spans = tokenize_with_offsets(text, "code")
    assert ("import", 0, 6) in spans
    assert ("import", 10, 16) in spans
    assert ("y_2", 17, 20) in spans
    for t, s, e in spans:
        assert text[s:e].lower() == t or t == "y_2"


def test_tokenize_with_offsets_text_stems_and_drops_stopwords():
    text = "The hopeful cafés"
    spans = tokenize_with_offsets(text, "text")
    # 'the' dropped; 'hopeful'->'hope' span covers the RAW token;
    # 'cafés'->'cafe' likewise
    assert spans == [("hope", 4, 11), ("cafe", 12, 17)]
    assert text[4:11] == "hopeful"


def test_highlight_matches_end_to_end(setup):
    eng, corpus = setup
    res = eng.search(TermF(term="import"), k=5)
    hl = highlight_matches(res, corpus, ["import"]).toPandas()
    assert len(hl) > 0
    assert set(hl["term"]) == {"import"}
    # every span slices to the term in the source content
    content = {
        (r["repo"], r["path"], r["commit"]): r["content"]
        for r in corpus.collect()
    }
    for r in hl.itertuples(index=False):
        src = content[(r.repo, r.path, r.commit)]
        assert src[r.start: r.end].lower() == "import"
    # only result docs appear
    res_keys = {
        (r["repo"], r["path"], r["commit"]) for r in res.collect()
    }
    assert {(r.repo, r.path, r.commit)
            for r in hl.itertuples(index=False)} <= res_keys
