"""Resumability (FIXTURES.md F6): a build killed after N committed waves,
then resumed, produces a byte-identical manifest to an uninterrupted build —
including per-segment content hashes and lineage."""

import pytest

from iresearch_spark.corpus import generate_corpus
from iresearch_spark.index.build import build_index
from iresearch_spark.index.manifest import manifest_path, read_checkpoints

N_DOCS = 200
N_SEGMENTS = 8


def _corpus(spark):
    return generate_corpus(spark, N_DOCS, num_partitions=3, min_tokens=20,
                           max_tokens=150)


def test_resume_reproduces_manifest(spark, tmp_path):
    d_full = str(tmp_path / "full")
    d_resume = str(tmp_path / "resumed")

    build_index(spark, _corpus(spark), d_full, num_segments=N_SEGMENTS, waves=4)

    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(
            spark, _corpus(spark), d_resume, num_segments=N_SEGMENTS, waves=4,
            fail_after_waves=2,
        )
    # half the segments are checkpointed, half are not
    cps = read_checkpoints(d_resume)
    assert 0 < len(cps) < N_SEGMENTS

    build_index(
        spark, _corpus(spark), d_resume, num_segments=N_SEGMENTS, waves=4,
        resume=True,
    )
    with open(manifest_path(d_full)) as f1, open(manifest_path(d_resume)) as f2:
        assert f1.read() == f2.read()  # byte-identical


def test_resume_skips_checkpointed_segments(spark, tmp_path):
    """Second resume run with everything checkpointed is a no-op commit."""
    d = str(tmp_path / "idx")
    build_index(spark, _corpus(spark), d, num_segments=4)
    m1 = open(manifest_path(d)).read()
    metrics = build_index(
        spark, _corpus(spark), d, num_segments=4, resume=True
    )
    assert metrics["docs"] == N_DOCS
    assert open(manifest_path(d)).read() == m1
