"""Property tests (hypothesis) for the dedup hash kernels — pure pandas,
no Spark session.

The md5 hash mode is the driver-oracle path (bit-exact DuckDB twins), so
its kernel internals get property coverage against naive per-document
re-implementations: shingle windowing across document boundaries, the
affine minhash in the 31-bit field, and the simhash vote/sign packing.
"""
import hashlib
import re

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from iresearch_spark.analysis import CODE_TOKEN_PATTERN
from iresearch_spark.pipeline.dedup import (
    _P31,
    _SHINGLE_SEP,
    _flat_doc_tokens,
    band_fold_coeffs,
    md5_minhash_constants,
)

_WORDS = st.lists(
    st.sampled_from(
        ["spark", "query", "fast", "x1", "alpha", "_tmp", "42", "Mixed",
         "engine", "def", "import", "", "  ", "a b", "UPPER"]
    ),
    min_size=0,
    max_size=12,
)
_DOCS = st.lists(_WORDS, min_size=1, max_size=6)


def _tok(text: str) -> list[str]:
    return re.findall(CODE_TOKEN_PATTERN, text.lower())


def _md5_int(s: str, hex_chars: int) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:hex_chars], 16)


def _pdf(docs: list[list[str]]) -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": range(len(docs)), "text": [" ".join(w) for w in docs]}
    )


@settings(max_examples=60, deadline=None)
@given(_DOCS, st.integers(min_value=1, max_value=4))
def test_md5_shingle_windows_match_naive(docs, shingle):
    """Per-doc shingle hash slices == a naive per-document window loop —
    in particular no window ever crosses a document boundary in the
    flattened array."""
    ids, hashes, starts = _flat_doc_tokens(
        _pdf(docs), shingle, "md5", md5_hex=7
    )
    got = {
        int(d): hashes[starts[i]: starts[i + 1]].tolist()
        for i, d in enumerate(ids)
    }
    want = {}
    for d, words in enumerate(docs):
        toks = _tok(" ".join(words))
        if len(toks) < shingle:
            continue
        want[d] = [
            _md5_int(_SHINGLE_SEP.join(toks[j: j + shingle]), 7)
            for j in range(len(toks) - shingle + 1)
        ]
    assert got == want


@settings(max_examples=40, deadline=None)
@given(_DOCS)
def test_md5_minhash_slots_match_naive(docs):
    """sig[d, i] == min over d's shingle hashes of (A_i*h + B_i) mod p,
    computed with arbitrary-precision Python ints (no uint64 wraparound
    anywhere in the 31-bit field)."""
    num_hashes = 8
    A, B = md5_minhash_constants(num_hashes)
    ids, hashes, starts = _flat_doc_tokens(_pdf(docs), 3, "md5", md5_hex=7)
    if ids.size == 0:
        return
    p = int(_P31)
    sig = np.empty((ids.size, num_hashes), dtype=np.uint64)
    for i in range(num_hashes):
        v = (A[i] * hashes + B[i]) % _P31
        sig[:, i] = np.minimum.reduceat(v, starts[:-1])
    for d_idx, d in enumerate(ids):
        hs = hashes[starts[d_idx]: starts[d_idx + 1]].tolist()
        for i in range(num_hashes):
            want = min((int(A[i]) * int(h) + int(B[i])) % p for h in hs)
            assert int(sig[d_idx, i]) == want


@settings(max_examples=40, deadline=None)
@given(_DOCS)
def test_md5_simhash_votes_match_naive(docs):
    """The packed 63-bit signature (full 64-bit simhash >> 1) == a naive
    per-token, per-bit vote count using Python ints."""
    ids, hashes, starts = _flat_doc_tokens(_pdf(docs), 1, "md5", md5_hex=16)
    bit_idx = np.arange(64, dtype=np.uint64)
    if ids.size:
        bits = ((hashes[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        acc = np.add.reduceat(bits * 2 - 1, starts[:-1], axis=0)
        packed = ((acc > 0).astype(np.uint64) << bit_idx[None, :]).sum(
            axis=1, dtype=np.uint64
        ) >> np.uint64(1)
    for d_idx, d in enumerate(ids):
        toks = _tok(" ".join(docs[int(d)]))
        assert toks, "kept docs have >= 1 token"
        want = 0
        for b in range(1, 64):
            votes = sum(
                1 if (_md5_int(t, 16) >> b) & 1 else -1 for t in toks
            )
            if votes > 0:
                want |= 1 << (b - 1)
        assert int(packed[d_idx]) == want


def test_band_fold_coeffs_are_modular_powers():
    p = int(_P31)
    for r in (1, 2, 4, 8):
        cs = band_fold_coeffs(r)
        assert cs[-1] == 1
        assert all(
            cs[j] == pow(1000003, r - 1 - j, p) for j in range(r)
        )
