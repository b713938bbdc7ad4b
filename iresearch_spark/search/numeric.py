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

from dataclasses import dataclass

import pandas as pd

from iresearch_spark.search.filters import Filter, TermRange

PRECISION_STEP = 8  # bits per trie level; 8 levels for int64
_LEVELS = 64 // PRECISION_STEP


def _to_unsigned(v: int) -> int:
    """Order-preserving map of signed int64 to unsigned (flip sign bit)."""
    return (int(v) + (1 << 63)) & ((1 << 64) - 1)


def encode_numeric_term(value: int, shift: int) -> str:
    """Term text of ``value`` at trie level ``shift`` (bits truncated)."""
    u = _to_unsigned(value) >> shift
    return f"{chr(ord('a') + shift // PRECISION_STEP)}{u:016x}"


def numeric_terms(value: int) -> list[str]:
    """All precision-level terms of one value (the indexed token stream)."""
    return [
        encode_numeric_term(value, shift)
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


@dataclass(frozen=True)
class GranularRange(Filter):
    """by_granular_range over a ``numeric``-analyzed field: docs whose
    value lies in the inclusive [min_val, max_val]; constant score =
    boost (a filter, like the reference's typical usage)."""

    field_name: str = "content"
    min_val: int = 0
    max_val: int = 0


def granular_ranges(
    min_val: int, max_val: int, step: int = PRECISION_STEP
) -> list[TermRange]:
    """Minimal per-level TermRange cover of the inclusive numeric range."""
    lo, hi = _to_unsigned(min_val), _to_unsigned(max_val)
    if lo > hi:
        return []
    out: list[TermRange] = []

    def add(lo_u: int, hi_u: int, shift: int) -> None:
        lvl = chr(ord("a") + shift // step)
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
