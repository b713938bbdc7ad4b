"""Bit-packed posting-block codec ("packed", `formats_10.cpp:86-131` /
`utils/bit_packing.cpp` analogue): round-trip equivalence with the varint
codec at the array level, end-to-end rank identity at the engine level,
merge/codec persistence, and the bytes win on dense postings."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iresearch_spark.codec import packed as P
from iresearch_spark.codec import postings as V
from iresearch_spark.index import build_index

SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


# ------------------------------------------------------------- array level


@st.composite
def posting_lists(draw):
    T = draw(st.integers(1, 6))
    lengths, docs, freqs, dls = [], [], [], []
    for _ in range(T):
        n = draw(st.integers(1, 400))
        gaps = draw(
            st.lists(
                st.integers(1, 1 << 20), min_size=n, max_size=n
            )
        )
        d = np.cumsum(np.asarray(gaps, dtype=np.int64))
        f = np.asarray(
            draw(st.lists(st.integers(1, 1 << 16), min_size=n, max_size=n)),
            dtype=np.int64,
        )
        dl = np.asarray(
            draw(st.lists(st.integers(1, 1 << 16), min_size=n, max_size=n)),
            dtype=np.int64,
        )
        lengths.append(n)
        docs.append(d)
        freqs.append(f)
        dls.append(dl)
    return (
        np.concatenate(docs),
        np.concatenate(freqs),
        np.concatenate(dls),
        np.asarray(lengths, dtype=np.int64),
    )


@settings(max_examples=40, deadline=None)
@given(posting_lists())
def test_packed_equals_varint_roundtrip(data):
    docs, freqs, dls, nt = data
    vb, vo, vl, vmf, vmn = V.encode_postings_batch(docs, freqs, dls, nt)
    pb, po, pl, pmf, pmn = P.encode_postings_batch(docs, freqs, dls, nt)
    for t in range(nt.size):
        # identical block metadata (WAND data is codec-independent)
        assert np.array_equal(vl[t], pl[t])
        assert np.array_equal(vmf[t], pmf[t])
        assert np.array_equal(vmn[t], pmn[t])
        d1, f1 = V.decode_postings(vb[t], int(nt[t]))
        d2, f2 = P.decode_postings(pb[t], int(nt[t]), po[t])
        assert np.array_equal(d1, d2) and np.array_equal(f1, f2)
        # selected-block decode parity on a pseudo-random block subset
        nb = len(po[t])
        sel = np.unique(np.arange(nb)[:: max(1, nb // 3)])
        a = P.decode_blocks(pb[t], po[t], pl[t], int(nt[t]), sel)
        b = V.decode_blocks(vb[t], vo[t], vl[t], int(nt[t]), sel)
        for x, y in zip(a, b):
            assert np.array_equal(x, y)
    dm_v = V.decode_postings_many(vb, nt)
    dm_p = P.decode_postings_many(pb, nt, list(po))
    assert np.array_equal(dm_v[0], dm_p[0])
    assert np.array_equal(dm_v[1], dm_p[1])


def test_packed_beats_varint_on_dense_blocks():
    """Dense hot-term postings (delta=1, tiny freqs) are the 100 TB scan
    case: packed must be a multiple smaller than byte-granular varint."""
    n = 128 * 64
    docs = np.arange(1, n + 1, dtype=np.int64)
    freqs = np.full(n, 2, dtype=np.int64)
    dls = np.full(n, 50, dtype=np.int64)
    nt = np.asarray([n], dtype=np.int64)
    vb, *_ = V.encode_postings_batch(docs, freqs, dls, nt)
    pb, *_ = P.encode_postings_batch(docs, freqs, dls, nt)
    assert len(pb[0]) < 0.35 * len(vb[0]), (len(pb[0]), len(vb[0]))


# ------------------------------------------------------------ engine level


@pytest.fixture(scope="module")
def corpora(spark, tmp_path_factory):
    """The same corpus built under both codecs."""
    from iresearch_spark.corpus import generate_corpus
    from iresearch_spark.index import build_index

    corpus = generate_corpus(spark, 600, 4)
    dirs = {}
    metrics = {}
    for codec in ("varint", "packed"):
        d = str(tmp_path_factory.mktemp(f"idx_{codec}"))
        metrics[codec] = build_index(
            spark, corpus, d, num_segments=4, codec=codec
        )
        dirs[codec] = d
    return dirs, metrics


def _battery():
    from iresearch_spark.search import And, Or, Phrase, Prefix, TermF, TermsF

    return [
        TermF(term="import"),
        Or(children=(TermF(term="import"), TermF(term="def"))),
        TermsF(terms=("import", "def", "sym_2"), min_match=2),
        And(children=(TermF(term="import"), TermF(term="def"))),
        Prefix(prefix="sym"),
        Phrase(terms=("import", "def")),
    ]


def test_packed_engine_rank_identity(spark, corpora):
    """Every query shape returns IDENTICAL rows (same scores, same order)
    from the packed index as from the varint index — the codec is invisible
    above the decode layer."""
    from iresearch_spark.search import SearchEngine

    dirs, metrics = corpora
    assert metrics["packed"]["docs"] == metrics["varint"]["docs"]
    ev = SearchEngine(spark, dirs["varint"])
    ep = SearchEngine(spark, dirs["packed"])
    for q in _battery():
        for wand in (True, False):
            rv = [tuple(r) for r in ev.search(q, k=20, wand=wand).collect()]
            rp = [tuple(r) for r in ep.search(q, k=20, wand=wand).collect()]
            assert rv == rp, (q, wand)
    ev.close()
    ep.close()


def test_packed_survives_merge_and_records_codec(spark, corpora):
    """Consolidation re-encodes with the manifest's codec and preserves the
    codec field; post-merge results stay identical to the varint twin."""
    from iresearch_spark.index import read_manifest
    from iresearch_spark.index.merge import merge_segments
    from iresearch_spark.search import SearchEngine, TermF

    dirs, _ = corpora
    man = read_manifest(dirs["packed"])
    assert man.postings_codec == "packed"
    seg_ids = [s["segment_id"] for s in man.segments]
    merge_segments(spark, dirs["packed"], seg_ids)
    man2 = read_manifest(dirs["packed"])
    assert man2.postings_codec == "packed"
    assert len(man2.segments) == 1
    ev = SearchEngine(spark, dirs["varint"])
    ep = SearchEngine(spark, dirs["packed"])
    for q in _battery():
        rv = [
            (r["repo"], r["path"], r["commit"], r["score"])
            for r in ev.search(q, k=20).collect()
        ]
        rp = [
            (r["repo"], r["path"], r["commit"], r["score"])
            for r in ep.search(q, k=20).collect()
        ]
        assert rv == rp, q
    ev.close()
    ep.close()


def test_packed_smaller_on_real_corpus(corpora):
    _, metrics = corpora
    assert (
        metrics["packed"]["postings_bytes"]
        < metrics["varint"]["postings_bytes"]
    ), metrics


def test_delete_publish_preserves_manifest_attrs(spark, tmp_path):
    """Regression (found in r5): mark_deleted's manifest rewrite hand-copied
    a field subset, silently resetting with_payloads / postings_codec — a
    delete on a packed or payload index then corrupted every later read."""
    from iresearch_spark.index import build_index, read_manifest
    from iresearch_spark.index.deletes import mark_deleted

    rows = [("r", f"{i:03d}.py", "c", "py", f"alpha beta doc{i}")
            for i in range(40)]
    d = str(tmp_path / "idx_del_codec")
    build_index(
        spark, spark.createDataFrame(rows, SCHEMA), d, num_segments=2,
        codec="packed",
    )
    keys = spark.createDataFrame(
        [("r", "003.py", "c")], "repo string, path string, commit string"
    )
    mark_deleted(spark, d, keys)
    man = read_manifest(d)
    assert man.postings_codec == "packed"


# ------------------------------------------------------- default + resume


def test_default_codec_is_packed(spark, tmp_path):
    """New indexes default to the packed codec (round-5 promotion: 0.70x
    postings bytes at rank identity, BENCH_codec.json)."""
    from iresearch_spark.codec import DEFAULT_CODEC
    from iresearch_spark.index import read_manifest

    assert DEFAULT_CODEC == "packed"
    rows = [("r", f"{i:03d}.py", "c", "py", f"alpha beta doc{i}")
            for i in range(30)]
    d = str(tmp_path / "idx_default_codec")
    build_index(spark, spark.createDataFrame(rows, SCHEMA), d,
                num_segments=2)
    assert read_manifest(d).postings_codec == "packed"


def test_resume_autodetects_original_codec(spark, tmp_path):
    """A resume must keep encoding like the index it resumes: the codec is
    read from the published manifest, NOT from the (new) default — an
    explicit-varint build interrupted mid-way and resumed without a codec
    argument stays varint, byte-identical to an uninterrupted varint
    build."""
    from iresearch_spark.corpus import generate_corpus
    from iresearch_spark.index import read_manifest
    from iresearch_spark.index.manifest import manifest_path

    corpus = generate_corpus(spark, 160, num_partitions=3)
    d_full = str(tmp_path / "full_varint")
    d_resume = str(tmp_path / "resumed_varint")
    build_index(spark, corpus, d_full, num_segments=4, waves=2,
                codec="varint")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus, d_resume, num_segments=4, waves=2,
                    codec="varint", fail_after_waves=1)
    build_index(spark, corpus, d_resume, num_segments=4, waves=2,
                resume=True)  # no codec= — auto-detected from the manifest
    assert read_manifest(d_resume).postings_codec == "varint"
    with open(manifest_path(d_full)) as f1, \
            open(manifest_path(d_resume)) as f2:
        assert f1.read() == f2.read()


def test_resume_codec_mismatch_raises(spark, tmp_path):
    """An explicit codec that contradicts the manifest is refused — mixed
    per-segment codecs inside one index would be unreadable."""
    from iresearch_spark.corpus import generate_corpus

    corpus = generate_corpus(spark, 120, num_partitions=2)
    d = str(tmp_path / "mismatch")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, corpus, d, num_segments=4, waves=2,
                    codec="varint", fail_after_waves=1)
    with pytest.raises(ValueError, match="codec"):
        build_index(spark, corpus, d, num_segments=4, waves=2,
                    resume=True, codec="packed")


def test_incremental_defaults_to_packed_on_new_index(spark, tmp_path):
    """A brand-new streaming index picks up the packed default; appended
    batches keep it (batches must encode exactly like the index they
    append to)."""
    from iresearch_spark.index import read_manifest
    from iresearch_spark.streaming.incremental import IncrementalIndexer

    d = str(tmp_path / "idx_stream_codec")
    ix = IncrementalIndexer(spark, d, segments_per_batch=2)
    assert ix.codec == "packed"
    rows = [("r", f"{i:03d}.py", "c", "py", f"gamma delta doc{i}")
            for i in range(20)]
    ix.process_batch(spark.createDataFrame(rows, SCHEMA), batch_id=0)
    assert read_manifest(d).postings_codec == "packed"
