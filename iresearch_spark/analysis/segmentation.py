"""Unicode (UAX#29) word segmentation — the reference's `segmentation`
analyzer (`core/analysis/segmentation_token_stream.cpp`, boost::text
`next_word_break`) with its two options: ``case`` (lower|upper|none,
default lower) and ``word_break`` (alpha|graphic|all, default alpha —
`accept_token` at segmentation_token_stream.cpp:270-280).

Path selection mirrors the collation analyzer: PyICU's BreakIterator when
importable, else a pure-Python implementation of the UAX#29 default word
boundary rules below. The Python path covers the rules the reference's
goldens exercise (`tests/analysis/segmentation_stream_tests.cpp`):

- WB3d   whitespace runs stay together
- WB4    Extend/Format chars are absorbed into the current segment
- WB5-7  ALetter runs; MidLetter/MidNumLet/SQ join letter·X·letter
- WB8-12 Numeric runs; MidNum/MidNumLet/SQ join digit·X·digit
- WB9/10 letters and digits concatenate ("1950s")
- WB13   Katakana runs; WB13a/b ExtendNumLet (underscore) joins
- WB999  everything else (incl. Han/Hiragana ideographs) breaks per char

This analyzer is the UNICODE option; the default build path stays the
`code` analyzer (JVM regexp tokenizer) for oracle parity and throughput —
see CLAUDE.md invariants. Indexing under this analyzer goes through the
pandas-UDF build path and `make_dl_expr` automatically runs the same
function for the Norm2 dl.
"""

from __future__ import annotations

import unicodedata

import pandas as pd

# UAX#29 WordBreakProperty classes (the subset the default rules use)
_ALETTER = 1
_NUMERIC = 2
_KATAKANA = 3
_IDEO = 4  # Han / Hiragana: no chaining rule -> one segment per glyph
_EXTNUMLET = 5
_MIDLETTER = 6
_MIDNUM = 7
_MIDNUMLET = 8  # incl. Single_Quote: both letter- and digit-joining
_WS = 9
_EXTEND = 10  # Extend/Format: ignored by WB4
_OTHER = 0

_WORDY = (_ALETTER, _NUMERIC, _EXTNUMLET)
_MIDS = (_MIDLETTER, _MIDNUM, _MIDNUMLET)

_MIDLETTER_CHARS = frozenset(":·״‧︓﹕：")
_MIDNUM_CHARS = frozenset(",;;։،؍٬︐︔")
_MIDNUMLET_CHARS = frozenset(".'‘’․﹒＇．")


def _classify(ch: str) -> int:
    o = ord(ch)
    if ch in _MIDLETTER_CHARS:
        return _MIDLETTER
    if ch in _MIDNUM_CHARS:
        return _MIDNUM
    if ch in _MIDNUMLET_CHARS:
        return _MIDNUMLET
    # Katakana (incl. halfwidth) before the generic isalpha branch
    if 0x30A0 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF or 0xFF66 <= o <= 0xFF9F:
        return _KATAKANA
    # Han + Hiragana + CJK extensions: WB999 per-glyph segments
    if (
        0x4E00 <= o <= 0x9FFF
        or 0x3400 <= o <= 0x4DBF
        or 0xF900 <= o <= 0xFAFF
        or 0x20000 <= o <= 0x2FA1F
        or 0x3040 <= o <= 0x309F
    ):
        return _IDEO
    cat = unicodedata.category(ch)
    if cat in ("Mn", "Mc", "Me", "Cf"):
        return _EXTEND
    if cat == "Pc" or ch == "_":
        return _EXTNUMLET
    if cat == "Nd":
        return _NUMERIC
    if ch.isalpha():
        return _ALETTER
    if cat == "Zs" or ch == "\t":
        return _WS
    return _OTHER


def uax29_segments(text: str) -> list[str]:
    """Every UAX#29 word segment of ``text``, in order (the ``all`` break
    mode — callers filter for alpha/graphic)."""
    segs: list[str] = []
    n = len(text)
    i = 0
    while i < n:
        c = _classify(text[i])
        j = i + 1
        if c in _WORDY or c == _KATAKANA:
            last_solid = c  # class of the last non-mid, non-extend char
            while j < n:
                nc = _classify(text[j])
                if nc == _EXTEND:  # WB4
                    j += 1
                    continue
                if nc in _WORDY or nc == _KATAKANA:
                    # WB5/8/9/10/13 + WB13a/b: katakana chains with
                    # katakana or via ExtendNumLet; letters/digits chain
                    # freely with each other and ExtendNumLet
                    if (nc == _KATAKANA) != (last_solid == _KATAKANA) and not (
                        nc == _EXTNUMLET or last_solid == _EXTNUMLET
                    ):
                        break
                    last_solid = nc
                    j += 1
                    continue
                if nc in _MIDS:
                    # peek past the mid (skipping Extend/Format, WB4)
                    k = j + 1
                    while k < n and _classify(text[k]) == _EXTEND:
                        k += 1
                    after = _classify(text[k]) if k < n else _OTHER
                    letter_join = (
                        nc in (_MIDLETTER, _MIDNUMLET)
                        and last_solid == _ALETTER
                        and after == _ALETTER
                    )
                    digit_join = (
                        nc in (_MIDNUM, _MIDNUMLET)
                        and last_solid == _NUMERIC
                        and after == _NUMERIC
                    )
                    if letter_join or digit_join:  # WB6/7, WB11/12
                        last_solid = after
                        j = k + 1
                        continue
                break
        elif c == _WS:
            while j < n and _classify(text[j]) == _WS:  # WB3d
                j += 1
        else:
            # OTHER / IDEO / stray mid or extend: single char, absorbing
            # trailing Extend marks (WB4)
            while j < n and _classify(text[j]) == _EXTEND:
                j += 1
        segs.append(text[i:j])
        i = j
    return segs


def _accept(token: str, word_break: str) -> bool:
    """accept_token (segmentation_token_stream.cpp:270-280)."""
    if word_break == "all":
        return True
    if word_break == "graphic":
        return not token.isspace()
    if word_break == "alpha":
        return any(ch.isalnum() for ch in token)
    raise ValueError(f"word_break must be alpha|graphic|all, got {word_break!r}")


def _convert_case(token: str, case: str) -> str:
    if case == "lower":
        return token.lower()
    if case == "upper":
        return token.upper()
    if case == "none":
        return token
    raise ValueError(f"case must be lower|upper|none, got {case!r}")


def _icu_segments_fn(locale: str):
    """ICU BreakIterator path (the reference links boost::text, which
    implements the same UAX#29 defaults ICU does)."""
    import icu

    bi = icu.BreakIterator.createWordInstance(icu.Locale(locale))

    def segments(text: str) -> list[str]:
        bi.setText(text)
        out = []
        start = bi.first()
        for end in bi:
            out.append(text[start:end])
            start = end
        return out

    return segments


def unicode_segmentation_analyzer(
    s: pd.Series,
    case: str = "lower",
    word_break: str = "alpha",
    locale: str = "en",
    impl: str = "auto",
) -> pd.Series:
    """UAX#29 segmentation token stream; vectorized over a string Series.
    Defaults match the reference (case=lower, break=alpha).

    ``impl`` pins the segmenter: "icu" (PyICU, raises if unavailable),
    "pure" (the bundled UAX#29 implementation), or "auto". In a
    distributed build, "auto" is only safe on homogeneously-provisioned
    workers — the two implementations legitimately disagree on
    dictionary-segmented scripts (Thai/Japanese), so a mixed fleet would
    tokenize the same doc differently on different executors and desync
    ``dl`` from the invert kernel (the BM25-norms invariant). Use an
    explicit impl (or a configured analyzer registered via
    register_analyzer) to make builds environment-independent."""
    # validate options eagerly (parse_vpack_options rejects bad enums)
    _accept("x", word_break)
    _convert_case("x", case)
    if impl not in ("auto", "icu", "pure"):
        raise ValueError(f"impl must be auto|icu|pure, got {impl!r}")
    if impl == "pure":
        segments = uax29_segments
    elif impl == "icu":
        segments = _icu_segments_fn(locale)  # ImportError if PyICU missing
    else:
        try:
            segments = _icu_segments_fn(locale)
        except ImportError:
            segments = uax29_segments

    def run(text: str) -> list[str]:
        return [
            _convert_case(t, case)
            for t in segments(text)
            if _accept(t, word_break)
        ]

    return s.fillna("").map(run)
