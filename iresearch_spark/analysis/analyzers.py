"""Analyzer registry — vectorized token streams.

The reference registers analyzers by name with JSON options
(`core/analysis/analyzers.{hpp,cpp}:224-247`); ours is a Python registry of
*vectorized* tokenizers: each takes a ``pandas.Series`` of strings and returns
a ``pandas.Series`` of ``list[str]`` token lists (positions are the list
ordinal, matching the reference's increment/position attribute chain,
`core/analysis/token_attributes.hpp:50-54`).

Analyzers implemented (reference counterpart):
- ``code`` / ``segmentation``: word-break + lower-case, the moral equivalent of
  `core/analysis/segmentation_token_stream.cpp` for source code: identifiers
  ``[a-z_][a-z0-9_]*`` and integer literals, on case-folded text. The pattern
  is deliberately expressible in Spark SQL (`regexp_extract_all`) and DuckDB
  for oracle parity.
- ``identity``: whole input as one token (`token_streams.hpp:87-113`).
- ``delimiter``: split on a delimiter (`delimited_token_stream.cpp`).
- ``ngram``: char n-grams (`ngram_token_stream.cpp`).
- ``norm``: lower-case, no tokenization (`text_token_normalizing_stream.cpp`).
- ``stopwords``: drop exact-match tokens (`token_stopwords_stream.cpp`).
- ``pipeline``: composition (`pipeline_token_stream.cpp`).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import pandas as pd

# Keep in sync with SQL oracles: Spark `regexp_extract_all(lower(x), ...)`
# and DuckDB `regexp_extract_all(lower(x), ...)` must tokenize identically.
CODE_TOKEN_PATTERN = r"[a-z_][a-z0-9_]*|[0-9]+"

Analyzer = Callable[[pd.Series], pd.Series]


def code_analyzer(s: pd.Series) -> pd.Series:
    """Case-folded identifier/number tokens; vectorized pandas str ops."""
    return s.fillna("").str.lower().str.findall(CODE_TOKEN_PATTERN)


def _blank_nulls(toks: pd.Series, mask: pd.Series) -> pd.Series:
    """NULL input = absent field: emit NO token (the reference indexes
    nothing for a document that lacks the field — a whole-value analyzer
    must not turn NULL into an empty-string term, or missing-field docs
    match Wildcard('%')/exists over the field). An actual empty string
    value still indexes the empty term."""
    if mask.any():
        toks = toks.copy()
        toks[mask] = pd.Series([[] for _ in range(int(mask.sum()))],
                               index=toks.index[mask])
    return toks


def identity_analyzer(s: pd.Series) -> pd.Series:
    return _blank_nulls(s.fillna("").map(lambda x: [x]), s.isna())


def norm_lower_analyzer(
    s: pd.Series, case: str = "lower", accent: bool = True
) -> pd.Series:
    """Whole input -> one normalized token
    (`text_token_normalizing_stream.cpp`): case = lower|upper|none;
    ``accent=False`` strips accents (the reference's accent option);
    NULL input -> no token (absent field)."""
    mask = s.isna()
    out = s.fillna("")
    if case == "lower":
        out = out.str.lower()
    elif case == "upper":
        out = out.str.upper()
    if not accent:
        from iresearch_spark.analysis.stem import strip_accents

        out = out.map(strip_accents)
    return _blank_nulls(out.map(lambda x: [x]), mask)


def delimiter_analyzer(s: pd.Series, delimiter: str = ",") -> pd.Series:
    return s.fillna("").str.split(delimiter)


def ngram_analyzer(
    s: pd.Series,
    n_min: int = 3,
    n_max: int = 3,
    preserve_original: bool = False,
    start_marker: str = "",
    end_marker: str = "",
) -> pd.Series:
    """Char n-grams in [n_min, n_max] (`ngram_token_stream.hpp:45-67`):
    ``preserve_original`` additionally emits the whole input;
    ``start_marker``/``end_marker`` prefix grams anchored at the start of
    the input / suffix grams anchored at its end (edge-ngram markers).
    Emission order follows the reference stream: by position, then gram
    length ascending."""

    def grams(x: str) -> list[str]:
        out: list[str] = []
        n_len = len(x)
        if n_len == 0:  # reference next() emits nothing for empty input
            return out
        for i in range(n_len):
            for n in range(n_min, n_max + 1):
                if i + n > n_len:
                    break
                g = x[i : i + n]
                is_whole = i == 0 and n == n_len
                if preserve_original and is_whole:
                    # the whole-input gram is covered by the original
                    # emission below (ngram_token_stream.cpp next() skips
                    # it while emit_original is pending)
                    continue
                if i == 0 and start_marker:
                    out.append(start_marker + g)
                    if is_whole and end_marker:
                        # whole-input gram with both markers: emitted again
                        # end-marked (next() "pretend we need to emit
                        # original" path)
                        out.append(g + end_marker)
                elif i + n == n_len and end_marker:
                    out.append(g + end_marker)
                else:
                    out.append(g)
            if i == 0 and preserve_original:
                # original sits at position 0 (emit_original: start-marked
                # form first, then end-marked when both markers are set)
                if start_marker:
                    out.append(start_marker + x)
                    if end_marker:
                        out.append(x + end_marker)
                elif end_marker:
                    out.append(x + end_marker)
                else:
                    out.append(x)
        return out

    return s.fillna("").map(grams)


def stopwords_filter(tokens: pd.Series, stopwords: frozenset[str]) -> pd.Series:
    return tokens.map(lambda ts: [t for t in ts if t not in stopwords])


def pipeline(*stages: Analyzer) -> Analyzer:
    def run(s: pd.Series) -> pd.Series:
        out = s
        for st in stages:
            out = st(out)
        return out

    return run


# default English stopword list of the reference's `text` analyzer is
# locale-dependent; this fixed small set keeps builds deterministic
DEFAULT_STOPWORDS = frozenset(
    "a an and are as at be by for from has he in is it its of on that the "
    "to was were will with".split()
)


# unicode word tokens (letters+digits+marks, no underscore): the moral
# equivalent of ICU word-break for the `text` analyzer
TEXT_TOKEN_PATTERN = r"[^\W_]+"


def text_analyzer(
    s: pd.Series,
    stopwords: frozenset[str] = DEFAULT_STOPWORDS,
    stemming: bool = True,
    accent: bool = False,
    min_gram: int | None = None,
    max_gram: int | None = None,
    preserve_original: bool = False,
    unicode_break: bool = False,
) -> pd.Series:
    """`text` analyzer pipeline in the REFERENCE's stage order
    (`text_token_stream.cpp:355-420 process_term`): word split -> lower ->
    accent strip (when ``accent=False``, like the reference's default) ->
    stopword check on the UNSTEMMED token -> snowball stem.

    ``min_gram``/``max_gram``/``preserve_original`` switch on EDGE n-grams
    over each processed token (`text_token_stream.cpp next_ngram`): emit
    prefixes of length [min_gram, max_gram]; a token outside that range is
    additionally emitted whole only under ``preserve_original``.

    Stemming is per-distinct-token via a memo dict (dictionary-level, not
    per-occurrence), keeping the Python cost O(vocab) per batch.

    ``unicode_break=True`` swaps the regex word split for real UAX#29
    segmentation (the reference's text analyzer delegates word breaks to
    ICU, `text_token_stream.cpp`); needed for CJK/Thai/mixed scripts where
    the regex and UAX#29 disagree."""
    from iresearch_spark.analysis.stem import stem_english, strip_accents

    if unicode_break:
        from iresearch_spark.analysis.segmentation import (
            unicode_segmentation_analyzer,
        )

        toks = unicode_segmentation_analyzer(s, case="lower")
    else:
        toks = s.fillna("").str.lower().str.findall(TEXT_TOKEN_PATTERN)
    memo: dict[str, list[str]] = {}
    ngrams = min_gram is not None or max_gram is not None or preserve_original

    def expand(t: str) -> list[str]:
        if not ngrams:
            return [t]
        lo = min_gram or 1
        hi = min(len(t), max_gram) if max_gram is not None else len(t)
        out = [t[:n] for n in range(lo, hi + 1)]
        if preserve_original and (len(t) < lo or hi < len(t)):
            out.append(t)
        return out

    def proc(ts: list[str]) -> list[str]:
        out = []
        for t in ts:
            if not accent:
                t = strip_accents(t)
            if t in stopwords:
                continue
            emitted = memo.get(t)
            if emitted is None:
                emitted = expand(stem_english(t) if stemming else t)
                memo[t] = emitted
            out.extend(emitted)
        return out

    return toks.map(proc)


def stopwords_analyzer(
    s: pd.Series, stopwords: frozenset[str] = DEFAULT_STOPWORDS
) -> pd.Series:
    return stopwords_filter(identity_analyzer(s), stopwords)


def stem_analyzer(s: pd.Series) -> pd.Series:
    """Whole input -> its lowered snowball stem, one token
    (`text_token_stemming_stream.cpp`: the stream wraps a single term)."""
    from iresearch_spark.analysis.stem import stem_english

    return s.fillna("").str.lower().map(lambda x: [stem_english(x)])


def multi_delimiter_analyzer(
    s: pd.Series, delimiters: tuple[str, ...] = (",", ";")
) -> pd.Series:
    """Split on ANY of a set of delimiters, dropping empty tokens
    (`multi_delimited_token_stream.hpp:34`)."""
    import re

    pat = "|".join(re.escape(d) for d in delimiters)
    rx = re.compile(pat)
    return s.fillna("").map(lambda x: [t for t in rx.split(x) if t])


def collation_analyzer(s: pd.Series, locale: str = "en") -> pd.Series:
    """Whole input -> one token: its collation sort key
    (`collation_token_stream.cpp:277` icu::Collator::getSortKey).

    With PyICU installed the real ICU sort key is emitted (hex-encoded so it
    stays a valid dictionary string). Without ICU (this environment) we fall
    back to a SIMPLIFIED primary-strength key — case-folded, accent-stripped
    codepoint order — which matches ICU primary strength for Latin-script
    text and is expressible in DuckDB (``lower(strip_accents(x))``) for
    oracle parity. Equal-under-collation strings map to equal tokens and
    keys sort in collation order; locale-specific tailoring (e.g. sv 'å' >
    'z') needs real ICU."""
    try:
        import icu  # PyICU, optional

        coll = icu.Collator.createInstance(icu.Locale(locale))
        return _blank_nulls(
            s.fillna("").map(lambda x: [coll.getSortKey(x).hex()]),
            s.isna(),
        )
    except ImportError:
        # the simplified primary key IS norm(lower, accent-strip) — one code
        # path to keep in sync with the DuckDB twin
        return norm_lower_analyzer(s, case="lower", accent=False)


def classification_analyzer(s: pd.Series, **options) -> pd.Series:
    """Top-k model labels for the whole input (`classification_stream.cpp`);
    see iresearch_spark.analysis.ml for the model-provider hook."""
    from iresearch_spark.analysis.ml import classification_analyzer as fn

    return fn(s, **options)


def nearest_neighbors_analyzer(s: pd.Series, **options) -> pd.Series:
    """Per-token top-k nearest-neighbor expansion
    (`nearest_neighbors_stream.cpp`); see iresearch_spark.analysis.ml."""
    from iresearch_spark.analysis.ml import nearest_neighbors_analyzer as fn

    return fn(s, **options)


def minhash_analyzer(
    s: pd.Series, num_hashes: int = 64, analyzer: str = "code"
) -> pd.Series:
    """Bottom-k MinHash signature tokens over a sub-analyzer's output
    (`minhash_token_stream.cpp:396-419 ComputeSignature`): hash every token
    to u64, keep the ``num_hashes`` smallest DISTINCT values, emit each as
    an unpadded base64 of the little-endian hash (`next()` at :368-385).
    Deviation (documented): token hash is our crc-mix u64 (dedup module),
    not CityHash64 — same bottom-k semantics, different literal tokens.
    Position fidelity: the reference emits all signature tokens at one
    position (increment 0); ours are consecutive ordinals."""
    import base64

    import numpy as np

    from iresearch_spark.pipeline.dedup import _hash_tokens_u64

    sub = get_analyzer(analyzer)

    def sig(ts: list[str]) -> list[str]:
        if not ts:
            return []
        h = np.unique(_hash_tokens_u64(np.asarray(ts, dtype=object)))
        return [
            base64.b64encode(
                np.uint64(v).astype("<u8").tobytes()
            ).decode().rstrip("=")
            for v in h[:num_hashes]
        ]

    return sub(s).map(sig)


def numeric_analyzer(s: pd.Series) -> pd.Series:
    """Numeric trie token stream (token_streams.hpp:118-250); see
    iresearch_spark.search.numeric."""
    from iresearch_spark.search.numeric import numeric_analyzer as fn

    return fn(s)


def numeric_double_analyzer(s: pd.Series) -> pd.Series:
    """Double trie token stream (the double_t branch of
    token_streams.hpp:118-250, sortable-bits encoded); see
    iresearch_spark.search.numeric."""
    from iresearch_spark.search.numeric import numeric_double_analyzer as fn

    return fn(s)


# bool/null sentinel token streams (`core/analysis/token_streams.hpp:47-82,
# 253-277`): a boolean value indexes as ONE single-byte term — \xFF for true,
# \x00 for false — and a null value as the empty term, so equality filters on
# bool/null columns run as ordinary term lookups.
BOOL_TRUE_TOKEN = "\xff"
BOOL_FALSE_TOKEN = "\x00"
NULL_TOKEN = ""


def boolean_analyzer(s: pd.Series) -> pd.Series:
    """boolean_token_stream (`token_streams.hpp:47-82`): value_true/value_
    false sentinels; NULL indexes nothing (pair with ``null`` to index it)."""

    def conv(v) -> list[str]:
        if v is None or v is pd.NA or (isinstance(v, float) and pd.isna(v)):
            return []
        return [BOOL_TRUE_TOKEN if bool(v) else BOOL_FALSE_TOKEN]

    return s.map(conv)


def null_analyzer(s: pd.Series) -> pd.Series:
    """null_token_stream (`token_streams.hpp:253-277`): NULL values index
    the empty term (non-null data pointer, zero length), making
    ``x == null`` an ordinary term query; non-null values index nothing."""

    def conv(v) -> list[str]:
        is_null = v is None or v is pd.NA or (
            isinstance(v, float) and pd.isna(v)
        )
        return [NULL_TOKEN] if is_null else []

    return s.map(conv)


def segmentation_unicode_analyzer(s: pd.Series, **options) -> pd.Series:
    """UAX#29 word segmentation (`segmentation_token_stream.cpp`, boost::
    text next_word_break) with the reference's case/break options; PyICU
    when present, pure-Python UAX#29 rules otherwise. The plain
    ``segmentation`` name stays aliased to ``code`` (JVM tokenizer, oracle
    parity); use this for CJK/mixed-script corpora."""
    from iresearch_spark.analysis.segmentation import (
        unicode_segmentation_analyzer as fn,
    )

    return fn(s, **options)


# ---------------------------------------------------------------- payloads
#
# The reference lets any analyzer attach a per-position `payload` attribute
# (arbitrary user bytes, `core/analysis/token_attributes.hpp:67-72`); the
# indexer stores it in the prox/pay stream when the field is indexed with
# IndexFeatures::PAY (`core/index/field_data.cpp:79-96` write_prox,
# `:992-1012` payload pickup). A payload analyzer here returns a PAIR of
# aligned Series: (list[str] tokens, list[bytes] payloads).

CODE_TOKEN_PATTERN_CI = r"[A-Za-z_][A-Za-z0-9_]*|[0-9]+"


def code_payload_original_analyzer(
    s: pd.Series,
) -> tuple[pd.Series, pd.Series]:
    """Code tokens with the ORIGINAL-CASE form as the position's payload
    (the classic Lucene-style "token attribute as payload" pattern). Both
    streams come from ONE case-insensitive extraction over the raw text, so
    token/payload alignment is exact by construction and the DuckDB twin is
    the same `regexp_extract_all` with `lower()` applied after the fact."""
    raw = s.fillna("").str.findall(CODE_TOKEN_PATTERN_CI)
    toks = raw.map(lambda ts: [t.lower() for t in ts])
    pays = raw.map(lambda ts: [t.encode("utf-8") for t in ts])
    return toks, pays


def delimited_payload_analyzer(
    s: pd.Series, delimiter: str = "|"
) -> tuple[pd.Series, pd.Series]:
    """Lucene ``DelimitedPayloadTokenFilter`` semantics: whitespace tokens of
    the form ``term<delim>payload``; text after the LAST delimiter becomes
    the position's payload bytes, tokens without a delimiter get b''."""

    def split(ts: list[str]) -> tuple[list[str], list[bytes]]:
        terms: list[str] = []
        pays: list[bytes] = []
        for t in ts:
            term, _, pay = t.rpartition(delimiter)
            if not _:
                term, pay = t, ""
            terms.append(term)
            pays.append(pay.encode("utf-8"))
        return terms, pays

    both = s.fillna("").str.split().map(split)
    return both.map(lambda x: x[0]), both.map(lambda x: x[1])


def code_offsets_analyzer(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Stored OFFS attribute (`core/analysis/token_attributes.hpp:37-47`
    offset{start,end}) carried on the PAY stream: each code token's payload
    is its ORIGINAL-text character span packed as two big-endian uint32s —
    the same 8-byte shape the reference serializes per position into the
    .pay/.offs streams (`formats_10.cpp:3618-3634`). One finditer pass
    produces both streams, so token/payload alignment is exact by
    construction; `SearchEngine.term_offsets` unpacks the pair JVM-side."""
    import re
    import struct

    pat = re.compile(CODE_TOKEN_PATTERN_CI)

    def run(text: str) -> tuple[list[str], list[bytes]]:
        toks: list[str] = []
        pays: list[bytes] = []
        for m in pat.finditer(text):
            toks.append(m.group().lower())
            pays.append(struct.pack(">II", m.start(), m.end()))
        return toks, pays

    both = s.fillna("").map(run)
    return both.map(lambda x: x[0]), both.map(lambda x: x[1])


PAYLOAD_ANALYZERS: dict[str, Callable] = {
    "code_payload": code_payload_original_analyzer,
    "delimited_payload": delimited_payload_analyzer,
    "code_offsets": code_offsets_analyzer,
}


def is_payload_analyzer(name: str) -> bool:
    return name in PAYLOAD_ANALYZERS


def get_payload_analyzer(name: str, **options) -> Callable:
    if name not in PAYLOAD_ANALYZERS:
        raise KeyError(
            f"unknown payload analyzer {name!r}; have {sorted(PAYLOAD_ANALYZERS)}"
        )
    fn = PAYLOAD_ANALYZERS[name]
    return partial(fn, **options) if options else fn


ANALYZERS: dict[str, Analyzer] = {
    "code": code_analyzer,
    "numeric": numeric_analyzer,
    "numeric_double": numeric_double_analyzer,
    "boolean": boolean_analyzer,
    "null": null_analyzer,
    "segmentation": code_analyzer,
    "segmentation_unicode": segmentation_unicode_analyzer,
    "identity": identity_analyzer,
    "norm": norm_lower_analyzer,
    "delimiter": delimiter_analyzer,
    "multi_delimiter": multi_delimiter_analyzer,
    "ngram": ngram_analyzer,
    "text": text_analyzer,
    "stem": stem_analyzer,
    "stopwords": stopwords_analyzer,
    "minhash": minhash_analyzer,
    "collation": collation_analyzer,
    "classification": classification_analyzer,
    "nearest_neighbors": nearest_neighbors_analyzer,
}


def register_analyzer(name: str, fn: Analyzer) -> None:
    """Register a (configured) analyzer under a name — the reference's
    REGISTER_ANALYZER with options (`analyzers.cpp:224-247`). The function
    must be picklable (e.g. ``partial(classification_analyzer,
    model=HashModel())``): build kernels resolve the name driver-side and
    ship the resolved function to executor workers in the UDF closure, so
    registration only needs to happen on the driver."""
    ANALYZERS[name] = fn


def get_analyzer(name: str, **options) -> Analyzer:
    if name not in ANALYZERS:
        raise KeyError(f"unknown analyzer {name!r}; have {sorted(ANALYZERS)}")
    fn = ANALYZERS[name]
    return partial(fn, **options) if options else fn


def tokenize_series(s: pd.Series, analyzer: str = "code") -> pd.Series:
    return get_analyzer(analyzer)(s)
