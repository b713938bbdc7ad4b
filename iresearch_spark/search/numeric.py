"""Numeric trie terms + granular range decomposition.

The reference indexes numerics as multi-precision token streams
(`core/analysis/token_streams.hpp:118-250` numeric_token_stream) so
`by_granular_range` (`core/search/granular_range_filter.cpp`) touches a
handful of coarse terms instead of every distinct value. Same trick here:

- the ``numeric`` analyzer emits one term per precision level: level L
  covers ``value >> (L*STEP)`` bits, encoded as ``<level-char><16-hex>``
  of the sign-flipped unsigned value, so LEXICOGRAPHIC term order equals
  NUMERIC order within a level (the dictionary's TermRange scan is the
  trie walk).
- :func:`granular_ranges` splits an inclusive [lo, hi] into the minimal
  per-level TermRange cover (the classic trie range decomposition, cf.
  Lucene LegacyNumericUtils.splitLongRange — public algorithm), which the
  executor runs as an unscored multi-term union with constant score.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import pandas as pd

from iresearch_spark.search.filters import Filter, TermRange

PRECISION_STEP = 8  # bits per trie level; 8 levels for int64/double
_LEVELS = 64 // PRECISION_STEP
_MAX_U64 = (1 << 64) - 1
# distinct level alphabets keep int and double tries separate term spaces
# (the reference's int64 and double numeric_token_streams likewise never
# collide: the encoded byte patterns differ per type)
_LEVEL_BASE = {"int": "a", "double": "q"}


def _to_unsigned(v: int) -> int:
    """Order-preserving map of signed int64 to unsigned (flip sign bit)."""
    return (int(v) + (1 << 63)) & _MAX_U64


def _to_unsigned_f64(v: float) -> int:
    """Order-preserving map of an IEEE-754 double to uint64 — the
    reference's make_sortable64 over the raw bits followed by the sign
    flip (`utils/numeric_utils.cpp:155-158` + dtoi64 :266-277): a negative
    double inverts all its bits, a positive one flips only the sign bit,
    so uint64 order == numeric order."""
    bits = struct.unpack("<q", struct.pack("<d", float(v)))[0]
    bits ^= (bits >> 63) & 0x7FFFFFFFFFFFFFFF
    return (bits + (1 << 63)) & _MAX_U64


def _unsigned(value, dtype: str) -> int:
    return _to_unsigned(value) if dtype == "int" else _to_unsigned_f64(value)


def encode_numeric_term(value, shift: int, dtype: str = "int") -> str:
    """Term text of ``value`` at trie level ``shift`` (bits truncated)."""
    u = _unsigned(value, dtype) >> shift
    return f"{chr(ord(_LEVEL_BASE[dtype]) + shift // PRECISION_STEP)}{u:016x}"


def numeric_terms(value, dtype: str = "int") -> list[str]:
    """All precision-level terms of one value (the indexed token stream)."""
    return [
        encode_numeric_term(value, shift, dtype)
        for shift in range(0, 64, PRECISION_STEP)
    ]


def numeric_analyzer(s: pd.Series) -> pd.Series:
    """Registry analyzer: numeric (or numeric-string) column -> per-doc
    trie term list; nulls index nothing."""

    def conv(x) -> list[str]:
        # nulls index nothing — accept None/NaN/pd.NA and '' (a NULL that
        # was string-coerced upstream) without raising
        # pd.isna BEFORE the '' compare: `pd.NA == ""` is pd.NA, and
        # bool(pd.NA) raises
        if x is None or pd.isna(x) or x == "":
            return []
        return numeric_terms(int(x))

    return s.map(conv)


def numeric_double_analyzer(s: pd.Series) -> pd.Series:
    """Registry analyzer: double column -> per-doc trie term list under
    the sortable-double encoding (the reference's double_t
    numeric_token_stream, `analysis/token_streams.hpp:118-250`); nulls
    index nothing."""

    def conv(x) -> list[str]:
        if x is None or pd.isna(x) or x == "":
            return []
        return numeric_terms(float(x), dtype="double")

    return s.map(conv)


@dataclass(frozen=True)
class GranularRange(Filter):
    """by_granular_range over a ``numeric``- or ``numeric_double``-analyzed
    field: docs whose value lies in [min_val, max_val]; constant score =
    boost (a filter, like the reference's typical usage).

    Bounds follow the reference's by_granular_range_options
    (`granular_range_filter.hpp`): ``include_min``/``include_max`` pick
    BoundType INCLUSIVE vs EXCLUSIVE, and a ``None`` bound is open (the
    reference's numeric_traits inf/ninf sentinel streams). A float-typed
    bound (or a float on either side) queries the DOUBLE trie — the term
    space of ``numeric_double`` — mirroring the reference, where a
    double_t token stream only matches double-indexed values."""

    field_name: str = "content"
    min_val: int | float | None = 0
    max_val: int | float | None = 0
    include_min: bool = True
    include_max: bool = True


def granular_ranges(
    min_val,
    max_val,
    step: int = PRECISION_STEP,
    include_min: bool = True,
    include_max: bool = True,
) -> list[TermRange]:
    """Minimal per-level TermRange cover of the numeric range. Exclusive
    bounds step one encoding unit inward (for doubles that is exactly
    nextafter, since the sortable encoding is a bijection onto ordered
    uint64); ``None`` bounds are open."""
    dtype = (
        "double"
        if isinstance(min_val, float) or isinstance(max_val, float)
        else "int"
    )
    lo = 0 if min_val is None else _unsigned(min_val, dtype)
    hi = _MAX_U64 if max_val is None else _unsigned(max_val, dtype)
    if min_val is not None and not include_min:
        lo += 1
    if max_val is not None and not include_max:
        hi -= 1
    if lo > hi or lo > _MAX_U64 or hi < 0:
        return []
    out: list[TermRange] = []
    base = _LEVEL_BASE[dtype]

    def add(lo_u: int, hi_u: int, shift: int) -> None:
        lvl = chr(ord(base) + shift // step)
        out.append(
            TermRange(
                min_term=f"{lvl}{lo_u >> shift:016x}",
                max_term=f"{lvl}{hi_u >> shift:016x}",
            )
        )

    shift = 0
    while True:
        diff = 1 << (shift + step)
        mask = ((1 << step) - 1) << shift
        has_lower = (lo & mask) != 0
        has_upper = (hi & mask) != mask
        next_lo = ((lo + diff) if has_lower else lo) & ~mask & ((1 << 64) - 1)
        next_hi = ((hi - diff) if has_upper else hi) & ~mask
        if (
            shift + step >= 64
            or next_lo > next_hi
            or next_lo < lo
            or next_hi > hi
        ):
            add(lo, hi, shift)
            break
        if has_lower:
            add(lo, lo | mask, shift)
        if has_upper:
            add(hi & ~mask, hi, shift)
        lo, hi = next_lo, next_hi
        shift += step
    return out
