"""Bit-packed POSITIONS stream (the packed codec's prox-stream twin,
`formats_10.cpp:230-265` pos block write via `bit_packing.cpp`):
round-trip equivalence with the varint positions codec at the array level,
end-to-end phrase/offsets/payload identity at the engine level, merge +
manifest persistence, and legacy-manifest compatibility (indexes written
before positions gained a packed encoding keep decoding as varint)."""

import json

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iresearch_spark.codec import packed as P
from iresearch_spark.codec import postings as V
from iresearch_spark.index import build_index, read_manifest

SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


# ------------------------------------------------------------- array level


@st.composite
def position_streams(draw):
    """(freqs, flat_positions, term_lengths): term-major / doc-major /
    position-ascending, arbitrary gaps (absolute at each doc start)."""
    T = draw(st.integers(1, 5))
    lengths, freqs, flats = [], [], []
    for _ in range(T):
        n = draw(st.integers(1, 40))  # postings in this term
        lengths.append(n)
        for _ in range(n):
            f = draw(st.integers(1, 30))
            gaps = draw(
                st.lists(st.integers(0, 1 << 18), min_size=f, max_size=f)
            )
            # first gap is the absolute first position; rest are deltas >= 1
            pos = np.cumsum(
                np.asarray(gaps, dtype=np.int64)
                + np.concatenate([[0], np.ones(f - 1, dtype=np.int64)])
            )
            freqs.append(f)
            flats.append(pos)
    return (
        np.asarray(freqs, dtype=np.int64),
        np.concatenate(flats),
        np.asarray(lengths, dtype=np.int64),
    )


@settings(max_examples=40, deadline=None)
@given(position_streams())
def test_packed_positions_roundtrip_equals_varint(data):
    freqs, flat, nt = data
    vb, _ = V.encode_positions_batch(freqs, flat, nt)
    pb, poffs = P.encode_positions_batch(freqs, flat, nt)
    ts = np.concatenate([[0], np.cumsum(nt)])[:-1]
    for t in range(nt.size):
        f_t = freqs[ts[t] : ts[t] + nt[t]]
        dv = V.decode_positions(vb[t], f_t)
        # packed decodes identically with stored chunk offsets AND by
        # header-walking without them
        assert np.array_equal(dv, P.decode_positions(pb[t], f_t, poffs[t]))
        assert np.array_equal(dv, P.decode_positions(pb[t], f_t))


def test_packed_positions_chunk_layout():
    """One term, 300 occurrences: 2 full 128-chunks + a 44-value varint
    tail; stored offsets point at each chunk (tail included)."""
    freqs = np.full(100, 3, dtype=np.int64)  # 300 occurrences
    flat = np.tile(np.asarray([5, 9, 12], dtype=np.int64), 100)
    nt = np.asarray([100], dtype=np.int64)
    pb, poffs = P.encode_positions_batch(freqs, flat, nt)
    blob, offs = pb[0], poffs[0]
    assert len(offs) == 3  # 2 full chunks + tail
    w0 = blob[offs[0]]
    assert offs[1] - offs[0] == 1 + 16 * w0
    out = P.decode_positions(blob, freqs, offs)
    assert np.array_equal(out, flat)


def test_packed_positions_smaller_on_dense_stream():
    """Hot-term occurrences with small within-doc deltas — the packed
    chunks beat one-byte-per-varint."""
    f = 16
    freqs = np.full(256, f, dtype=np.int64)
    flat = np.tile(np.arange(10, 10 + 2 * f, 2, dtype=np.int64), 256)
    nt = np.asarray([256], dtype=np.int64)
    vb, _ = V.encode_positions_batch(freqs, flat, nt)
    pb, _ = P.encode_positions_batch(freqs, flat, nt)
    assert len(pb[0]) < 0.85 * len(vb[0]), (len(pb[0]), len(vb[0]))


@settings(max_examples=25, deadline=None)
@given(position_streams(), st.randoms(use_true_random=False))
def test_decode_positions_many_equals_per_row_loop(data, rnd):
    """The merge hot path: cross-row vectorized decode == a per-row decode
    loop, for BOTH codecs, with stored offsets, header-walking (packed),
    and None placeholder rows mixed in."""
    freqs, flat, nt = data
    ts = np.concatenate([[0], np.cumsum(nt)])[:-1]
    occ = np.concatenate([[0], np.cumsum(freqs)])
    for mod in (V, P):
        blobs, offs = mod.encode_positions_batch(freqs, flat, nt)
        # per-row reference
        exp_parts, occ_rs = [], []
        for t in range(nt.size):
            f_t = freqs[ts[t] : ts[t] + nt[t]]
            occ_rs.append(int(occ[ts[t]]))
            exp_parts.append(mod.decode_positions(blobs[t], f_t, offs[t]))
        exp = np.concatenate(exp_parts)
        got = mod.decode_positions_many(blobs, freqs, nt, offs)
        assert np.array_equal(got, exp)
        if mod is P:  # header-walk path (offsets column absent)
            assert np.array_equal(
                mod.decode_positions_many(blobs, freqs, nt, None), exp
            )
        # None placeholder rows decode to zeros through the permutation
        none_at = {
            t for t in range(nt.size) if rnd.random() < 0.4
        } or {0}
        mixed = [None if t in none_at else b for t, b in enumerate(blobs)]
        exp2 = exp.copy()
        for t in none_at:
            o0 = int(occ[ts[t]])
            o1 = int(occ[ts[t] + nt[t]])
            exp2[o0:o1] = 0
        got2 = mod.decode_positions_many(mixed, freqs, nt, offs)
        assert np.array_equal(got2, exp2)


# ------------------------------------------------------------ engine level


@pytest.fixture(scope="module")
def pos_corpora(spark, tmp_path_factory):
    """A positions-heavy corpus built under both codecs."""
    from iresearch_spark.corpus import generate_corpus

    corpus = generate_corpus(spark, 400, 3, min_tokens=60, max_tokens=400)
    dirs = {}
    for codec in ("varint", "packed"):
        d = str(tmp_path_factory.mktemp(f"posidx_{codec}"))
        build_index(spark, corpus, d, num_segments=3, codec=codec)
        dirs[codec] = d
    return dirs


def test_manifest_records_positions_codec(pos_corpora):
    man_p = read_manifest(pos_corpora["packed"])
    man_v = read_manifest(pos_corpora["varint"])
    assert man_p.positions_codec == "packed"
    assert man_v.positions_codec == "varint"


def test_phrase_identity_across_positions_codecs(spark, pos_corpora):
    """Positional queries (the only readers of the prox stream) return
    IDENTICAL rows from both codecs."""
    from iresearch_spark.search import Phrase, SamePosition, SearchEngine, TermF

    ev = SearchEngine(spark, pos_corpora["varint"])
    ep = SearchEngine(spark, pos_corpora["packed"])
    queries = [
        Phrase(terms=("import", "def")),
        Phrase(terms=("the", "for")),
        Phrase(terms=("import", "the"), offsets=(0, 2)),  # gap phrase
        SamePosition(terms=("import", "return")),
    ]
    for q in queries:
        rv = [tuple(r) for r in ev.search(q, k=25).collect()]
        rp = [tuple(r) for r in ep.search(q, k=25).collect()]
        assert rv == rp, q
    ev.close()
    ep.close()


def test_merge_preserves_packed_positions(spark, pos_corpora):
    """Consolidation decodes packed positions per row (the chunk grid
    restarts per input blob — no concat fast path), re-encodes packed, and
    keeps the manifest field; phrase results are unchanged."""
    from iresearch_spark.index.merge import merge_segments
    from iresearch_spark.search import Phrase, SearchEngine

    d = pos_corpora["packed"]
    q = Phrase(terms=("import", "def"))

    def rows(eng):
        return sorted(
            (r["repo"], r["path"], r["commit"], r["score"])
            for r in eng.search(q, k=25).collect()
        )

    before = rows(SearchEngine(spark, d))
    man = read_manifest(d)
    merge_segments(spark, d, [s["segment_id"] for s in man.segments])
    man2 = read_manifest(d)
    assert man2.positions_codec == "packed"
    # doc identity + scores survive (segment/doc ids are remapped)
    assert rows(SearchEngine(spark, d)) == before


def test_offsets_and_payloads_ride_packed_positions(spark, tmp_path):
    """A stored-OFFS index under the packed codec: pay streams stay aligned
    with the (packed) positions permutation; spans still slice the source
    text exactly."""
    from iresearch_spark.search import SearchEngine

    rows = [
        ("r", f"{i:03d}.py", "c", "py",
         f"alpha beta{i % 7} gamma alpha delta{i % 3} alpha")
        for i in range(60)
    ]
    d = str(tmp_path / "offs_packed")
    build_index(
        spark, spark.createDataFrame(rows, SCHEMA), d, num_segments=2,
        fields=[("content", "code_offsets")], codec="packed",
    )
    man = read_manifest(d)
    assert man.positions_codec == "packed" and man.with_payloads
    eng = SearchEngine(spark, d)
    got = eng.term_offsets("alpha").collect()
    assert len(got) == 3 * 60
    src = {r[1]: r[4] for r in rows}
    for r in got:
        text = src[r["path"]]
        assert text[r["start_off"] : r["end_off"]] == "alpha"
    eng.close()


# ------------------------------------------------- legacy + append paths


def test_legacy_manifest_reads_varint_positions(tmp_path):
    """A manifest written before positions_codec existed (key absent) must
    parse as varint positions even when postings are packed."""
    d = tmp_path / "legacy"
    d.mkdir()
    (d / "manifest.json").write_text(
        json.dumps(
            {
                "format_version": 1,
                "num_segments": 1,
                "field": "content",
                "analyzer": "code",
                "with_positions": True,
                "segments": [],
                "postings_codec": "packed",
            }
        )
    )
    man = read_manifest(str(d))
    assert man.postings_codec == "packed"
    assert man.positions_codec == "varint"


def test_incremental_adopts_existing_positions_codec(spark, tmp_path):
    """Appending to an index whose manifest lacks positions_codec (legacy)
    must keep encoding positions varint — NOT the new packed default."""
    from iresearch_spark.streaming.incremental import IncrementalIndexer

    d = str(tmp_path / "idx_stream_legacy")
    rows = [("r", f"{i:03d}.py", "c", "py", f"epsilon zeta doc{i}")
            for i in range(20)]
    ix = IncrementalIndexer(spark, d, segments_per_batch=2)
    ix.process_batch(spark.createDataFrame(rows, SCHEMA), batch_id=0)
    assert read_manifest(d).positions_codec == "packed"

    # strip the key to simulate a legacy index, then append
    import os

    p = os.path.join(d, "manifest.json")
    m = json.loads(open(p).read())
    m.pop("positions_codec")
    open(p, "w").write(json.dumps(m))
    ix2 = IncrementalIndexer(spark, d, segments_per_batch=2)
    assert ix2.pos_codec == "varint"
    assert ix2.codec == "packed"


def test_import_rejects_positions_codec_mismatch(spark, tmp_path):
    """Import requires matching positions codecs (a mixed index would be
    unreadable)."""
    from iresearch_spark.index.importer import import_index

    rows = [("r", f"{i:03d}.py", "c", "py", f"eta theta doc{i}")
            for i in range(20)]
    df = spark.createDataFrame(rows, SCHEMA)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    build_index(spark, df, d1, num_segments=1, codec="packed")
    build_index(spark, df, d2, num_segments=1, codec="packed")
    # strip d2's positions_codec -> legacy varint positions
    p = f"{d2}/manifest.json"
    m = json.loads(open(p).read())
    m.pop("positions_codec")
    open(p, "w").write(json.dumps(m))
    with pytest.raises(ValueError, match="codec"):
        import_index(spark, d1, d2)
