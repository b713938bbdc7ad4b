"""Collation, classification, and nearest_neighbors analyzers.

Reference semantics: `collation_token_stream.cpp:277` (one token = ICU sort
key), `classification_stream.cpp` (top-k labels per input line),
`nearest_neighbors_stream.cpp:234-257` (per-word top-k NN expansion). The
model-backed pair goes through the reference's model-provider hook
(`classification_stream.cpp:43`); tests register the deterministic
HashModel stand-in.
"""

import pandas as pd
import pytest

from iresearch_spark.analysis.analyzers import (
    collation_analyzer,
    get_analyzer,
    tokenize_series,
)
from iresearch_spark.analysis.ml import HashModel, set_model_provider


def test_collation_equal_under_case_and_accents():
    s = pd.Series(["Résumé", "resume", "RESUME", "café"])
    out = collation_analyzer(s).tolist()
    assert out[0] == out[1] == out[2] == ["resume"]
    assert out[3] == ["cafe"]


def test_collation_keys_sort_in_collation_order():
    words = ["Banana", "äpple", "apple", "Cherry"]
    keys = [t[0] for t in collation_analyzer(pd.Series(words))]
    ranked = [w for _, w in sorted(zip(keys, words))]
    assert ranked[:2] == ["apple", "äpple"] or ranked[:2] == ["äpple", "apple"]
    assert ranked[2:] == ["Banana", "Cherry"]


def test_classification_top_k_labels_deterministic():
    prev = set_model_provider(lambda loc: HashModel(("__label__x", "__label__y")))
    try:
        s = pd.Series(["some document text", "another one"])
        out1 = get_analyzer("classification", top_k=2)(s).tolist()
        out2 = get_analyzer("classification", top_k=2)(s).tolist()
        assert out1 == out2
        assert all(sorted(t) == ["__label__x", "__label__y"] for t in out1)
        top1 = get_analyzer("classification", top_k=1)(s).tolist()
        assert [t[0] for t in out1] == [t[0] for t in top1]
    finally:
        set_model_provider(prev)


def test_nearest_neighbors_expands_each_word():
    prev = set_model_provider(lambda loc: HashModel())
    try:
        s = pd.Series(["alpha beta", ""])
        out = get_analyzer("nearest_neighbors", top_k=2)(s).tolist()
        assert out[0] == ["alpha~0", "alpha~1", "beta~0", "beta~1"]
        assert out[1] == []
    finally:
        set_model_provider(prev)


def test_model_analyzers_raise_without_provider():
    prev = set_model_provider(None)
    try:
        with pytest.raises(NotImplementedError):
            tokenize_series(pd.Series(["x"]), "classification")
        with pytest.raises(NotImplementedError):
            tokenize_series(pd.Series(["x"]), "nearest_neighbors")
    finally:
        set_model_provider(prev)


def test_minhash_bottom_k_signature():
    import numpy as np

    from iresearch_spark.analysis.analyzers import minhash_analyzer
    from iresearch_spark.pipeline.dedup import _hash_tokens_u64

    text = " ".join(f"tok{i}" for i in range(100))
    s = pd.Series([text, " ".join(reversed(text.split())), "one two", ""])
    out = minhash_analyzer(s, num_hashes=8).tolist()
    assert len(out[0]) == 8
    assert out[0] == out[1]  # order-invariant (set semantics)
    assert len(out[2]) == 2  # fewer distinct tokens than k
    assert out[3] == []
    # tokens are the base64 of the 8 smallest distinct hashes
    h = np.unique(_hash_tokens_u64(np.asarray(text.split(), dtype=object)))
    import base64

    expect = [
        base64.b64encode(np.uint64(v).astype("<u8").tobytes()).decode().rstrip("=")
        for v in h[:8]
    ]
    assert out[0] == expect


def test_registered_classification_analyzer_builds_index(spark, tmp_path):
    """register_analyzer + model= closure: model-backed analyzers must work
    INSIDE executor workers (the provider global is driver-only)."""
    from functools import partial

    import pandas as pd

    from iresearch_spark.analysis import register_analyzer
    from iresearch_spark.analysis.ml import classification_analyzer
    from iresearch_spark.index import build_index
    from iresearch_spark.search import SearchEngine, TermF

    register_analyzer(
        "cls_test",
        partial(
            classification_analyzer,
            model=HashModel(("__label__a", "__label__b")),
            top_k=1,
        ),
    )
    pdf = pd.DataFrame(
        {"repo": ["r"] * 6, "path": [f"p{i}" for i in range(6)],
         "commit": [f"c{i}" for i in range(6)], "lang": ["t"] * 6,
         "content": [f"document body {i}" for i in range(6)]}
    )
    d = str(tmp_path / "idx_cls")
    build_index(
        spark, spark.createDataFrame(pdf), d, num_segments=2,
        analyzer="cls_test",
    )
    eng = SearchEngine(spark, d)
    got = {
        r["path"]
        for lbl in ("__label__a", "__label__b")
        for r in eng.search(TermF(term=lbl), k=None).collect()
    }
    assert got == {f"p{i}" for i in range(6)}
