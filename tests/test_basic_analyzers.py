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
    # preserve_original emits the whole input when it's not already a gram
    out = ngram_analyzer(
        pd.Series(["abcd"]), n_min=2, n_max=2, preserve_original=True
    ).tolist()[0]
    assert out == ["ab", "bc", "cd", "abcd"]
    # short input within [min,max] is its own gram — no duplicate original
    out2 = ngram_analyzer(
        pd.Series(["ab"]), n_min=2, n_max=3, preserve_original=True
    ).tolist()[0]
    assert out2 == ["ab"]
    # start/end markers tag grams anchored at the input's edges
    out3 = ngram_analyzer(
        pd.Series(["abc"]), n_min=2, n_max=2, start_marker="^", end_marker="$"
    ).tolist()[0]
    assert out3 == ["^ab", "bc$"]


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
