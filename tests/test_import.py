"""Cross-index segment import (`index_writer.hpp:518-525 Import`).

Gate: importing index B's segments into index A must answer queries
identically to one index built over the union corpus — BM25 stats are
global (aggregated over the manifest at prepare time), so segmentation and
segment-id provenance must not matter.
"""

import pytest
from pyspark.sql import functions as F

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index import build_index, import_index, read_manifest
from iresearch_spark.search import Or, SearchEngine, TermF


def _topk(spark, index_dir, k=20):
    eng = SearchEngine(spark, index_dir)
    q = Or(children=(TermF(term="import"), TermF(term="return")))
    rows = eng.search(q, k=k).collect()
    return [(r["repo"], r["path"], round(r["score"], 5)) for r in rows]


def test_import_matches_union_build(spark, tmp_path):
    corpus = generate_corpus(spark, 240, 4).cache()
    part_a = corpus.filter(F.crc32(F.col("path")) % 2 == 0)
    part_b = corpus.filter(F.crc32(F.col("path")) % 2 == 1)

    da, db, du = (str(tmp_path / n) for n in ("a", "b", "union"))
    build_index(spark, part_a, da, num_segments=3)
    build_index(spark, part_b, db, num_segments=2)
    build_index(spark, corpus, du, num_segments=5)

    res = import_index(spark, da, db)
    assert res["imported"] == 2
    m = read_manifest(da)
    assert len(m.segments) == 5
    assert all(
        s["lineage"].get("imported_from")
        for s in m.segments
        if s["segment_id"] in res["mapping"].values()
    )

    assert _topk(spark, da) == _topk(spark, du)
    corpus.unpersist()


def test_import_carries_tombstones_and_rejects_mismatch(spark, tmp_path):
    from iresearch_spark.index import mark_deleted

    corpus = generate_corpus(spark, 80, 2).cache()
    da, db, dngram = (str(tmp_path / n) for n in ("a2", "b2", "ng"))
    part_a = corpus.filter(F.crc32(F.col("path")) % 2 == 0)
    part_b = corpus.filter(F.crc32(F.col("path")) % 2 == 1)
    build_index(spark, part_a, da, num_segments=2)
    build_index(spark, part_b, db, num_segments=2)

    # tombstone 5 docs in B, then import: they must stay invisible in A
    victims = part_b.select("repo", "path", "commit").limit(5)
    n = mark_deleted(spark, db, victims)
    assert n == 5
    import_index(spark, da, db)
    eng = SearchEngine(spark, da)
    hits = eng.search(TermF(term="import"), k=None).select("repo", "path")
    gone = hits.join(victims.select("repo", "path"), ["repo", "path"])
    assert gone.count() == 0

    # analyzer mismatch is refused
    build_index(spark, part_b, dngram, num_segments=2, analyzer="ngram")
    with pytest.raises(ValueError):
        import_index(spark, da, dngram)
    corpus.unpersist()
