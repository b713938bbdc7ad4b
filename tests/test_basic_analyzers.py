"""Unit goldens for the small analyzers (delimiter, multi_delimiter, ngram,
norm, stopwords, pipeline, identity, stem-wrap) — reference counterparts in
`core/analysis/*_token_stream.cpp`; emission order for ngram follows the
reference stream (by position, then gram length)."""

import pandas as pd

from iresearch_spark.analysis.analyzers import (
    delimiter_analyzer,
    get_analyzer,
    identity_analyzer,
    multi_delimiter_analyzer,
    ngram_analyzer,
    norm_lower_analyzer,
    pipeline,
    stopwords_analyzer,
    stopwords_filter,
    tokenize_series,
)


def test_delimiter_split():
    out = delimiter_analyzer(pd.Series(["a,b,,c", None]), delimiter=",").tolist()
    assert out[0] == ["a", "b", "", "c"]  # empties kept (reference keeps them)
    assert out[1] == [""]


def test_multi_delimiter_drops_empties():
    out = multi_delimiter_analyzer(
        pd.Series(["a,b;;c", "x"]), delimiters=(",", ";")
    ).tolist()
    assert out == [["a", "b", "c"], ["x"]]


def test_ngram_range_order():
    out = ngram_analyzer(pd.Series(["abcd"]), n_min=2, n_max=3).tolist()[0]
    assert out == ["ab", "abc", "bc", "bcd", "cd"]


def test_ngram_preserve_original_and_markers():
    # preserve_original emits the whole input at position 0
    out = ngram_analyzer(
        pd.Series(["abcd"]), n_min=2, n_max=2, preserve_original=True
    ).tolist()[0]
    assert out == ["ab", "abcd", "bc", "cd"]
    # input within [min,max] is its own gram — no duplicate original
    out2 = ngram_analyzer(
        pd.Series(["ab"]), n_min=2, n_max=3, preserve_original=True
    ).tolist()[0]
    assert out2 == ["ab"]
    # start/end markers tag grams anchored at the input's edges
    out3 = ngram_analyzer(
        pd.Series(["abc"]), n_min=2, n_max=2, start_marker="^", end_marker="$"
    ).tolist()[0]
    assert out3 == ["^ab", "bc$"]
    # whole-input gram with BOTH markers is emitted twice (start- then
    # end-marked), mirroring the reference's emit-again path
    out4 = ngram_analyzer(
        pd.Series(["ab"]), n_min=2, n_max=2, start_marker="^", end_marker="$"
    ).tolist()[0]
    assert out4 == ["^ab", "ab$"]
    # both-marker original emits both variants; empty input emits nothing
    out5 = ngram_analyzer(
        pd.Series(["abc", ""]), n_min=2, n_max=2, preserve_original=True,
        start_marker="^", end_marker="$",
    ).tolist()
    assert out5[0] == ["^ab", "^abc", "abc$", "bc$"]
    assert out5[1] == []


def test_norm_lower_single_token():
    assert norm_lower_analyzer(pd.Series(["AbC dEf"])).tolist() == [["abc def"]]


def test_stopwords_exact_match_only():
    out = stopwords_analyzer(
        pd.Series(["the", "theory"]), stopwords=frozenset({"the"})
    ).tolist()
    assert out == [[], ["theory"]]


def test_pipeline_composition():
    # delimiter -> stopword filter, like the reference pipeline stream
    ana = pipeline(
        lambda s: delimiter_analyzer(s, delimiter=" "),
        lambda toks: stopwords_filter(toks, frozenset({"the"})),
    )
    assert ana(pd.Series(["the quick fox"])).tolist() == [["quick", "fox"]]


def test_identity_and_registry_options():
    assert identity_analyzer(pd.Series(["A b"])).tolist() == [["A b"]]
    out = tokenize_series(pd.Series(["x;y"]), "delimiter")
    assert out.tolist() == [["x;y"]]  # default delimiter ','
    out2 = get_analyzer("delimiter", delimiter=";")(pd.Series(["x;y"]))
    assert out2.tolist() == [["x", "y"]]


def test_phrase_positions_and_terms_pairs():
    """Pure-DSL helpers: Phrase.positions() cumulative gap math
    (phrase_filter.hpp push_back offs) and TermsF.pairs() boost unwrap."""
    from iresearch_spark.search import Phrase, TermsF

    assert Phrase(terms=("a", "b", "c")).positions() == (0, 1, 2)
    assert Phrase(terms=("a", "b"), offsets=(0, 1)).positions() == (0, 2)
    # leading offset normalized away (phrase_filter.cpp:273 base_offset)
    assert Phrase(terms=("a", "b", "c"), offsets=(1, 0, 3)).positions() == (0, 1, 5)
    assert Phrase(terms=("a", "b"), offsets=(2, 0)).positions() == (0, 1)
    # short offsets pad with 0 (adjacent)
    assert Phrase(terms=("a", "b", "c"), offsets=(0, 2)).positions() == (0, 3, 4)
    assert TermsF(terms=("x", ("y", 2.0))).pairs() == (("x", 1.0), ("y", 2.0))


def test_text_analyzer_edge_ngrams():
    """text analyzer edge-ngram options (`text_token_stream.cpp next_ngram`):
    prefixes of the PROCESSED (stemmed) token in [min_gram, max_gram];
    out-of-range tokens emitted whole only under preserve_original."""
    from iresearch_spark.analysis.analyzers import text_analyzer

    s = pd.Series(["querying ox"])
    # 'querying' stems to 'queri'
    out = text_analyzer(s, min_gram=3, max_gram=4).tolist()[0]
    assert out == ["que", "quer"]  # 'ox' (len 2 < 3) dropped
    out2 = text_analyzer(s, min_gram=3, max_gram=4, preserve_original=True)
    assert out2.tolist()[0] == ["que", "quer", "queri", "ox"]
    # token length within range: whole token is its own longest prefix,
    # not duplicated by preserve_original
    out3 = text_analyzer(pd.Series(["cat"]), min_gram=2, max_gram=5,
                         preserve_original=True).tolist()[0]
    assert out3 == ["ca", "cat"]
    # no ngram options: unchanged pipeline
    assert text_analyzer(s).tolist()[0] == ["queri", "ox"]


def test_norm_case_and_accent_options():
    out = norm_lower_analyzer(
        pd.Series(["Crème Brûlée"]), case="upper", accent=False
    ).tolist()
    assert out == [["CREME BRULEE"]]
    out2 = norm_lower_analyzer(pd.Series(["AbC"]), case="none").tolist()
    assert out2 == [["AbC"]]


def test_whole_value_analyzers_null_is_absent_field():
    """NULL input = absent field = NO token for the whole-value analyzers
    (the reference indexes nothing for a doc that lacks the field,
    `wildcard_filter_test.cpp` simple_sequential goldens); an actual empty
    string value still indexes the empty term. The dl twin in
    make_dl_expr exempts these analyzers from the fillna('') coalesce so
    the Norm2 dl counts 0 for missing-field docs — keep both in sync."""
    from iresearch_spark.analysis.analyzers import (
        collation_analyzer,
        identity_analyzer,
        norm_lower_analyzer,
    )

    s = pd.Series(["abc", None, ""])
    for fn in (identity_analyzer, norm_lower_analyzer, collation_analyzer):
        toks = fn(s)
        assert toks.tolist()[1] == [], fn.__name__
        assert toks.str.len().tolist() == [1, 0, 1], fn.__name__
