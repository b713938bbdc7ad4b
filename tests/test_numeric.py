"""Numeric trie terms + in-index granular range
(token_streams.hpp:118-250 numeric stream, granular_range_filter.cpp)."""

import numpy as np
import pandas as pd
import pytest

from iresearch_spark.index.build import build_index
from iresearch_spark.search import (
    And,
    GranularRange,
    SearchEngine,
    TermF,
    granular_ranges,
    numeric_terms,
)
from iresearch_spark.search.numeric import PRECISION_STEP, encode_numeric_term


def _covered(val: int, ranges) -> bool:
    terms = {encode_numeric_term(val, s) for s in range(0, 64, PRECISION_STEP)}
    for tr in ranges:
        lvl = tr.min_term[0]
        shift = (ord(lvl) - ord("a")) * PRECISION_STEP
        t = encode_numeric_term(val, shift)
        if tr.min_term <= t <= tr.max_term:
            assert t in terms
            return True
    return False


@pytest.mark.parametrize(
    "lo,hi",
    [
        (0, 0), (5, 5), (0, 255), (3, 700), (250, 270), (-17, 42),
        (-1000, -900), (2**40, 2**40 + 10_000), (-(2**62), 2**62),
    ],
)
def test_granular_decomposition_exact_cover(lo, hi):
    """Every value inside [lo,hi] is covered; boundary-adjacent values
    outside are NOT."""
    ranges = granular_ranges(lo, hi)
    assert ranges
    rng = np.random.default_rng(42)
    inside = {lo, hi, (lo + hi) // 2} | {
        int(x) for x in rng.integers(lo, hi + 1, size=50)
    }
    for v in inside:
        assert _covered(v, ranges), v
    for v in (lo - 1, lo - 2, hi + 1, hi + 2):
        assert not _covered(v, ranges), v


def test_granular_term_count_is_logarithmic():
    # a naive per-value expansion of this range would be ~10^6 terms;
    # the trie cover must stay tiny
    ranges = granular_ranges(1, 1_000_000)
    assert len(ranges) <= 2 * (64 // PRECISION_STEP) * 2


def test_numeric_terms_levels():
    ts = numeric_terms(300)
    assert len(ts) == 64 // PRECISION_STEP
    assert len(set(ts)) == len(ts)
    # lexicographic order within a level == numeric order
    assert encode_numeric_term(5, 0) < encode_numeric_term(6, 0)
    assert encode_numeric_term(-3, 0) < encode_numeric_term(2, 0)


def test_granular_range_end_to_end(spark, tmp_path):
    n = 300
    rng = np.random.default_rng(9)
    sizes = rng.integers(-500, 5000, size=n)
    pdf = pd.DataFrame(
        {
            "repo": ["r"] * n,
            "path": [f"p{i:04d}" for i in range(n)],
            "commit": ["c"] * n,
            "lang": ["t"] * n,
            "content": [f"doc body tok{i % 7}" for i in range(n)],
            "size": sizes,
        }
    )
    d = str(tmp_path / "idx_num")
    build_index(
        spark, spark.createDataFrame(pdf), d, num_segments=2,
        fields=[("content", "code"), ("size", "numeric")],
    )
    eng = SearchEngine(spark, d)
    lo, hi = 100, 2500
    got = sorted(
        r["path"]
        for r in eng.search(
            GranularRange(field_name="size", min_val=lo, max_val=hi), k=None
        ).collect()
    )
    want = sorted(pdf[(pdf["size"] >= lo) & (pdf["size"] <= hi)]["path"])
    assert got == want
    # conjunction with a content term: intersection, score = 0 + bm25
    both = eng.search(
        And(children=(TermF(term="tok3"),
                      GranularRange(field_name="size", min_val=lo,
                                    max_val=hi))),
        k=None,
    ).collect()
    want_both = sorted(
        pdf[(pdf["size"] >= lo) & (pdf["size"] <= hi)
            & pdf["content"].str.contains("tok3")]["path"]
    )
    assert sorted(r["path"] for r in both) == want_both


def test_numeric_analyzer_null_variants_index_nothing():
    """None / NaN / pd.NA / '' all yield empty term lists (nulls index
    nothing) — pd.NA in particular must not reach `x == ""` first, whose
    result is pd.NA and whose truthiness raises."""
    import numpy as np
    import pandas as pd

    from iresearch_spark.search.numeric import numeric_analyzer

    s = pd.Series([7, None, float("nan"), pd.NA, "", "12"], dtype=object)
    out = numeric_analyzer(s)
    assert len(out.iloc[0]) > 0 and len(out.iloc[5]) > 0
    for i in (1, 2, 3, 4):
        assert out.iloc[i] == []


# ------------------------------------------------- double (sortable) trie


def _covered_f64(val: float, ranges) -> bool:
    for tr in ranges:
        lvl = tr.min_term[0]
        shift = (ord(lvl) - ord("q")) * PRECISION_STEP
        t = encode_numeric_term(val, shift, dtype="double")
        if tr.min_term <= t <= tr.max_term:
            return True
    return False


def test_double_encoding_is_order_preserving():
    """The sortable-double map (numeric_utils.cpp:155-158 make_sortable64
    + sign flip) is strictly monotone across sign, magnitude, and
    subnormal boundaries, and the trie terms inherit the order."""
    from iresearch_spark.search.numeric import _to_unsigned_f64

    vals = [float("-inf"), -1e300, -30000.0, -123.456, -1.0, -1e-300,
            -0.0, 0.0, 1e-300, 0.5, 1.0, 100.0, 10000.123, 10000.124,
            1e300, float("inf")]
    enc = [_to_unsigned_f64(v) for v in vals]
    assert all(a < b for a, b in zip(enc, enc[1:]))
    lvl0 = [encode_numeric_term(v, 0, dtype="double") for v in vals]
    assert lvl0 == sorted(lvl0)


@pytest.mark.parametrize(
    "lo,hi,imin,imax",
    [
        (-20000.0, 20000.0, True, True),
        (100.0, float("inf"), False, True),
        (float("-inf"), 10000.123, True, False),
        (10000.123, 10000.123, True, True),
        (0.5, 2.5, True, True),
        (-1e9, 1e9, False, False),
    ],
)
def test_granular_double_decomposition_exact_cover(lo, hi, imin, imax):
    """Every in-range fixture double is covered by the decomposition;
    every out-of-range one is not (exclusive bounds step exactly one
    encoding unit = nextafter)."""
    import math

    ranges = granular_ranges(lo, hi, include_min=imin, include_max=imax)
    probe = [-30000.0, -10004.0, -456.0, -123.0, 0.0, 0.5, 1.0, 2.5,
             100.0, 1000.0, 10000.0, 10000.123, 10000.456, 10005.0,
             20007.0, 1e9, -1e9,
             math.nextafter(100.0, math.inf),
             math.nextafter(10000.123, -math.inf)]
    for v in probe:
        inside = (v > lo if not imin else v >= lo) and (
            v < hi if not imax else v <= hi
        )
        assert _covered_f64(v, ranges) == inside, v


def test_granular_double_engine_roundtrip(spark, tmp_path):
    """numeric_double end-to-end: a double column indexed via the trie
    analyzer answers GranularRange with float bounds (the int trie is a
    disjoint term space and stays unaffected)."""
    rows = [("r", f"p{i}", "c", "txt", f"body {i}", float(v))
            for i, v in enumerate([-2.5, 0.0, 0.125, 3.5, 1000.25])]
    corpus = spark.createDataFrame(
        rows,
        "repo string, path string, commit string, lang string, "
        "content string, score_val double",
    )
    d = str(tmp_path / "idx_double")
    build_index(spark, corpus, d, num_segments=1,
                fields=[("content", "code"), ("score_val", "numeric_double")])
    eng = SearchEngine(spark, d)
    got = {
        r["path"]
        for r in eng.search(
            GranularRange(field_name="score_val", min_val=0.0, max_val=3.5,
                          include_max=False),
            k=None,
        ).collect()
    }
    assert got == {"p1", "p2"}
    got = {
        r["path"]
        for r in eng.search(
            GranularRange(field_name="score_val", min_val=float("-inf"),
                          max_val=0.0, include_max=True),
            k=None,
        ).collect()
    }
    assert got == {"p0", "p1"}
    eng.close()
