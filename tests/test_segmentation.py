"""UAX#29 segmentation goldens, mirroring the reference's
`tests/analysis/segmentation_stream_tests.cpp` token-by-token (values and
order; byte offsets are a reference-storage detail we don't emit).

The Python UAX#29 path (`uax29_segments`) is always tested directly; the
registered analyzer is additionally tested through whichever path is
active (PyICU if importable, else the same Python rules).
"""

import pandas as pd
import pytest

from iresearch_spark.analysis.analyzers import get_analyzer
from iresearch_spark.analysis.segmentation import (
    uax29_segments,
    unicode_segmentation_analyzer,
)

DATA = (
    "File:Constantinople(1878)-Turkish Goverment information brocure "
    "(1950s) - Istanbul coffee house.png"
)

ALPHA_NONE = [
    "File:Constantinople", "1878", "Turkish", "Goverment", "information",
    "brocure", "1950s", "Istanbul", "coffee", "house.png",
]


def _run(data: str, **opts) -> list[str]:
    return unicode_segmentation_analyzer(pd.Series([data]), **opts).iloc[0]


def test_alpha_no_case():
    # segmentation_stream_tests.cpp alpha_no_case_test
    assert _run(DATA, case="none") == ALPHA_NONE


def test_alpha_lower_case_default():
    # alpha_lower_case_test: LOWER is the default
    assert _run(DATA) == [t.lower() for t in ALPHA_NONE]


def test_alpha_upper_case():
    assert _run(DATA, case="upper") == [t.upper() for t in ALPHA_NONE]


def test_graphic_upper_case():
    # graphic_upper_case_test: punctuation kept, whitespace dropped
    assert _run(DATA, case="upper", word_break="graphic") == [
        "FILE:CONSTANTINOPLE", "(", "1878", ")", "-", "TURKISH",
        "GOVERMENT", "INFORMATION", "BROCURE", "(", "1950S", ")", "-",
        "ISTANBUL", "COFFEE", "HOUSE.PNG",
    ]


def test_all_lower_case():
    # all_lower_case_test: every segment, including whitespace
    assert _run(DATA, word_break="all") == [
        "file:constantinople", "(", "1878", ")", "-", "turkish", " ",
        "goverment", " ", "information", " ", "brocure", " ", "(",
        "1950s", ")", " ", "-", " ", "istanbul", " ", "coffee", " ",
        "house.png",
    ]


def test_chinese_glyphs():
    # chinese_glyphs_test: one token per Han ideograph; the ideographic
    # full stop (U+3002) is dropped by the alpha filter
    data = "今天下午的太阳很温暖。"
    assert _run(data, case="none") == list(data[:-1])


def test_invalid_options_raise():
    # parse_vpack_options rejects unknown enum values
    with pytest.raises(ValueError):
        _run(DATA, word_break="nope")
    with pytest.raises(ValueError):
        _run(DATA, case="nope")


# ---------------------------------------------------------------- raw rules
def test_python_rules_whitespace_runs_and_tabs():
    # WB3d: a run of spaces is ONE segment
    assert uax29_segments("a  b") == ["a", "  ", "b"]


def test_python_rules_midnum_joins_digits_only():
    # WB11/12: ',' joins digit,digit; never letter,letter
    assert uax29_segments("1,000") == ["1,000"]
    assert uax29_segments("a,b") == ["a", ",", "b"]
    # WB6/7: ':' joins letters only — '3:14' splits, 'a:b' joins
    assert uax29_segments("3:14") == ["3", ":", "14"]
    assert uax29_segments("a:b") == ["a:b"]
    # MidNumLet '.' joins both same-type sides
    assert uax29_segments("3.14") == ["3.14"]
    assert uax29_segments("a.b") == ["a.b"]
    assert uax29_segments("a.5") == ["a", ".", "5"]


def test_python_rules_trailing_mid_not_absorbed():
    # mid char with no joinable right side ends the word
    assert uax29_segments("end.") == ["end", "."]
    assert uax29_segments("end. Next") == ["end", ".", " ", "Next"]


def test_python_rules_extendnumlet_underscore():
    # WB13a/b: underscore joins — matches the code tokenizer's identifiers
    assert uax29_segments("foo_bar baz") == ["foo_bar", " ", "baz"]


def test_python_rules_katakana_runs_hiragana_singles():
    # WB13: Katakana chains; Hiragana (no rule) breaks per glyph
    assert uax29_segments("カタカナ") == ["カタカナ"]
    assert uax29_segments("ひら") == ["ひ", "ら"]


def test_python_rules_combining_marks_absorbed():
    # WB4: Extend chars stay inside the word ('e' + U+0301 COMBINING ACUTE)
    assert uax29_segments("cafe\u0301 bar") == ["cafe\u0301", " ", "bar"]


def test_registered_analyzer_and_build_dl_parity(spark, tmp_path):
    """The analyzer is registry-resolvable and an index built with it has
    docmeta dl == the analyzer's own token counts (the make_dl_expr
    invariant that keeps BM25 norms honest)."""
    from iresearch_spark.index.build import build_index

    texts = [
        "File:Constantinople(1878)-Turkish 1950s house.png",
        "今天下午 mixed CJK and ascii",
        "plain words only",
    ]
    fn = get_analyzer("segmentation_unicode")
    want_dl = [len(ts) for ts in fn(pd.Series(texts))]
    corpus = spark.createDataFrame(
        [("r", f"f{i}.txt", "c", "txt", t) for i, t in enumerate(texts)],
        "repo string, path string, commit string, lang string, content string",
    )
    d = str(tmp_path / "idx_seg")
    build_index(spark, corpus, d, num_segments=1,
                analyzer="segmentation_unicode")
    meta = {
        r["path"]: r["dl"]
        for r in spark.read.parquet(f"{d}/docmeta")
        .select("path", "dl")
        .collect()
    }
    assert [meta[f"f{i}.txt"] for i in range(3)] == want_dl


def test_text_analyzer_unicode_break_option():
    fn = get_analyzer("text", unicode_break=True, stemming=False)
    out = fn(pd.Series(["File:Constantinople 今天 the end."]))
    # 'the' is a stopword; UAX#29 keeps 'file:constantinople' whole and
    # splits the ideographs per glyph
    assert out.iloc[0] == [
        "file:constantinople", "今", "天", "end",
    ]


def test_impl_pure_pins_fallback_segmenter():
    """impl='pure' must produce the bundled UAX#29 segmentation regardless
    of whether PyICU is importable — the knob that makes distributed builds
    environment-independent (a mixed icu/pure fleet would tokenize the same
    doc differently and desync dl from the invert kernel)."""
    got = _run(DATA, case="none", impl="pure")
    want = [
        _t for _t in uax29_segments(DATA)
        if any(ch.isalnum() for ch in _t)
    ]
    assert got == [t for t in want]


def test_impl_icu_raises_or_segments():
    try:
        import icu  # noqa: F401
        has_icu = True
    except ImportError:
        has_icu = False
    if has_icu:
        assert _run(DATA, impl="icu")
    else:
        with pytest.raises(ImportError):
            _run(DATA, impl="icu")


def test_impl_rejects_unknown():
    with pytest.raises(ValueError):
        _run(DATA, impl="bogus")
