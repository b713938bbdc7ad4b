"""Scorers: BM25 (default, float32-exact to the reference), TFIDF, boost.

BM25 mirrors `core/search/bm25.cpp` bit-for-bit in float32:

- idf    = float32( log1p_f64( (N_field - n_term + 0.5) / (n_term + 0.5) ) )
           (collect(), bm25.cpp:381-383; accumulates across sub-terms)
- c0     = boost * (k+1) * idf                (BM15Context ctor, bm25.cpp:201)
- c1     = norm_const + norm_length * dl      (score fn, bm25.cpp:352-358)
  with norm_const = k - k*b, norm_length = (k*b) / avgdl,
  avgdl = float32(total_term_freq) / float32(docs_with_field)  (:391-401)
- score  = c0 - c0*c1 / (c1 + tf),  tf = float32(freq)

We always use the *general* Norm2 path (`formats` norm width >= 2 bytes), not
the dl<=255 LUT fast path (`bm25.cpp:350-355`): our corpora have dl > 255, so
the reference would pick u16 norms and take the same path. Documented
deviation: corpora whose every doc has dl <= 255 would hit the reference's LUT
whose float rounding differs in the last ulp.

A float64 mode exists for SQL-oracle comparison (DuckDB computes in double);
the float32 mode is the rank-identity target.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class BM25:
    """``norm="norm2"`` (default) is the modern path: tf = freq, |doc| = dl.
    ``norm="legacy"`` is the old-index `Norm` variant (`bm25.hpp:38-43`):
    tf = sqrt(freq) (the kSQRT cache, bm25.cpp:83-84) and |doc| = sqrt(dl) —
    the stored norm is float32(1/sqrt(dl)) and the scorer inverts it
    (`bm25.cpp:243-248` BM25NormAdapter), so the float32 mode reproduces the
    double rounding of store-then-invert."""

    k: float = 1.2  # bm25.hpp:63
    b: float = 0.75  # bm25.hpp:65
    name: str = "bm25"
    #: "norm2" | "legacy" | "none" — "none" is the reference's normless
    #: fallback ("No norms, pretend all fields have the same length 1",
    #: `bm25.cpp:488-490`): |doc| = 1 for every doc while avg_dl still
    #: comes from the real field stats — the scorer a reference user gets
    #: querying a field indexed without the norm feature.
    norm: str = "norm2"

    def _dl_eff(self, dls, dtype):
        if self.norm == "legacy":
            stored = (dtype(1.0) / np.sqrt(dls.astype(dtype))).astype(dtype)
            return (dtype(1.0) / stored).astype(dtype)
        if self.norm == "none":
            return np.ones(len(dls), dtype=dtype)
        return dls.astype(dtype)

    def _tf_eff(self, freqs, dtype):
        if self.norm == "legacy":
            return np.sqrt(freqs.astype(dtype)).astype(dtype)
        return freqs.astype(dtype)

    def field_consts(self, docs_with_field: int, total_term_freq: int, dtype=np.float32):
        k = dtype(self.k)
        kb = dtype(dtype(self.k) * dtype(self.b))
        norm_const = dtype(k - kb)
        if total_term_freq and docs_with_field:
            avgdl = dtype(dtype(total_term_freq) / dtype(docs_with_field))
            norm_length = dtype(kb / avgdl)
        else:
            norm_length = kb
        return norm_const, norm_length

    def idf(self, docs_with_field: int, docs_with_term: int, dtype=np.float32):
        # float64 log1p, then cast (bm25.cpp:381-383)
        v = np.log1p(
            (float(docs_with_field - docs_with_term) + 0.5)
            / (float(docs_with_term) + 0.5)
        )
        return dtype(v)

    def c0(self, boost: float, idf, dtype=np.float32):
        return dtype(dtype(boost) * dtype(dtype(self.k) + dtype(1.0)) * idf)

    def score(self, freqs, dls, c0, norm_const, norm_length, dtype=np.float32):
        tf = self._tf_eff(freqs, dtype)
        c1 = norm_const + norm_length * self._dl_eff(dls, dtype)
        return c0 - c0 * c1 / (c1 + tf)

    def block_upper_bound(self, max_freqs, min_norms, c0, norm_const, norm_length,
                          dtype=np.float32):
        """Per-block competitive score (kWandTagMinNorm: max freq + min norm,
        wand_writer.hpp:137-151): BM25 is increasing in tf and decreasing in
        dl (sqrt is monotone, so the legacy variant keeps both
        monotonicities), so (max_freq, min_dl) bounds every score in the
        block. One nextafter step guards against fp non-monotonicity at
        equal inputs."""
        ub = self.score(
            np.asarray(max_freqs), np.asarray(min_norms), c0, norm_const,
            norm_length, dtype,
        )
        return np.nextafter(ub, dtype(np.inf), dtype=dtype)


@dataclass(frozen=True)
class TFIDF:
    """`tfidf.cpp:185-187, 274-277`: score = sqrt(freq) * idf,
    idf = log1p((N_field + 1) / (n_term + 1)); optional x 1/sqrt(dl) norm."""

    with_norms: bool = False
    name: str = "tfidf"

    def field_consts(self, docs_with_field: int, total_term_freq: int, dtype=np.float32):
        return dtype(0.0), dtype(0.0)

    def idf(self, docs_with_field: int, docs_with_term: int, dtype=np.float32):
        return dtype(np.log1p((float(docs_with_field) + 1.0) / (float(docs_with_term) + 1.0)))

    def c0(self, boost: float, idf, dtype=np.float32):
        return dtype(dtype(boost) * idf)

    def score(self, freqs, dls, c0, norm_const, norm_length, dtype=np.float32):
        s = np.sqrt(freqs.astype(dtype)) * c0
        if self.with_norms:
            s = s * (dtype(1.0) / np.sqrt(dls.astype(dtype)))
        return s.astype(dtype)

    def block_upper_bound(self, max_freqs, min_norms, c0, norm_const, norm_length,
                          dtype=np.float32):
        ub = self.score(np.asarray(max_freqs), np.asarray(min_norms), c0,
                        norm_const, norm_length, dtype)
        return np.nextafter(ub, dtype(np.inf), dtype=dtype)


@dataclass(frozen=True)
class BoostScore:
    """boost_scorer.cpp: constant score = boost."""

    name: str = "boost"

    def field_consts(self, docs_with_field, total_term_freq, dtype=np.float32):
        return dtype(0.0), dtype(0.0)

    def idf(self, docs_with_field, docs_with_term, dtype=np.float32):
        return dtype(1.0)

    def c0(self, boost, idf, dtype=np.float32):
        return dtype(boost)

    def score(self, freqs, dls, c0, norm_const, norm_length, dtype=np.float32):
        return np.full(len(freqs), c0, dtype=dtype)

    def block_upper_bound(self, max_freqs, min_norms, c0, norm_const, norm_length,
                          dtype=np.float32):
        return np.full(len(np.asarray(max_freqs)), c0, dtype=dtype)
