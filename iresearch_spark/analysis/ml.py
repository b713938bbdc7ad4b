"""Model-backed analyzers: classification / nearest_neighbors.

The reference wraps a fastText model behind a process-global *model
provider* hook (`core/analysis/classification_stream.cpp:43,110-137`,
`core/analysis/nearest_neighbors_stream.cpp:216-219
set_model_provider`): the analyzer asks the provider for a model by
``model_location``; absent a registered provider it loads fastText
directly. fastText is not available in this environment, so the provider
hook IS the surface here: register a model object per location (tests use
the deterministic :class:`HashModel`), or install the real ``fasttext``
package and models load transparently.

Semantics mirrored:

- ``classification`` (`classification_stream.cpp`): the WHOLE input is one
  line; emit the model's top-k predicted labels (``predict``), optionally
  thresholded. One position (the reference emits all labels at increment 0
  on the first token).
- ``nearest_neighbors`` (`nearest_neighbors_stream.cpp:234-257`): tokenize
  the input into words; per word emit the model's top-k nearest-neighbor
  words (``getNN``). Deviation (documented): the reference gives the k
  neighbors of one source token the same position (increment=0 after the
  first); our token lists are position-by-ordinal, so neighbors occupy
  consecutive positions. Phrase/same-position queries over NN-analyzed
  fields are therefore not position-faithful; term/BM25 queries (the
  typical use: semantic term expansion) are unaffected.
"""

from __future__ import annotations

from typing import Callable, Protocol

import pandas as pd


class Model(Protocol):
    def predict(self, text: str, k: int, threshold: float) -> list[str]: ...

    def get_nn(self, word: str, k: int) -> list[str]: ...


ModelProvider = Callable[[str], Model]

_MODEL_PROVIDER: ModelProvider | None = None


def set_model_provider(provider: ModelProvider | None) -> ModelProvider | None:
    """Install the process-global model provider; returns the previous one
    (mirrors ``classification_stream::set_model_provider``)."""
    global _MODEL_PROVIDER
    prev, _MODEL_PROVIDER = _MODEL_PROVIDER, provider
    return prev


class _FastTextModel:
    """Adapter for a real ``fasttext`` model (only if the package exists)."""

    def __init__(self, path: str):
        import fasttext  # noqa: F401 — optional dependency

        self._m = fasttext.load_model(path)

    def predict(self, text: str, k: int, threshold: float) -> list[str]:
        labels, _ = self._m.predict(text, k=k, threshold=threshold)
        return list(labels)

    def get_nn(self, word: str, k: int) -> list[str]:
        return [w for _, w in self._m.get_nearest_neighbors(word, k=k)]


def _load_model(model_location: str) -> Model:
    if _MODEL_PROVIDER is not None:
        return _MODEL_PROVIDER(model_location)
    try:
        return _FastTextModel(model_location)
    except ImportError:
        raise NotImplementedError(
            "no model provider registered and the 'fasttext' package is not "
            "installed; call iresearch_spark.analysis.ml.set_model_provider "
            "(reference: classification_stream.cpp set_model_provider hook)"
        ) from None


class HashModel:
    """Deterministic stand-in model for tests: labels/neighbors are stable
    functions of the input (crc32 buckets) — no learned weights."""

    def __init__(self, labels: tuple[str, ...] = ("__label__a", "__label__b")):
        self.labels = labels

    def predict(self, text: str, k: int, threshold: float) -> list[str]:
        import zlib

        n = len(self.labels)
        start = zlib.crc32(text.encode()) % n
        return [self.labels[(start + i) % n] for i in range(min(k, n))]

    def get_nn(self, word: str, k: int) -> list[str]:
        return [f"{word}~{i}" for i in range(k)]


def classification_analyzer(
    s: pd.Series,
    model_location: str = "",
    top_k: int = 1,
    threshold: float = 0.0,
    model: Model | None = None,
) -> pd.Series:
    """Pass ``model=`` (a picklable object) to use this analyzer inside a
    Spark index build: ``get_analyzer('classification', model=HashModel())``
    captures the model in the serialized closure shipped to executor
    workers. ``set_model_provider`` is a per-PROCESS hook (mirroring the
    reference's process-global) — it is visible on the driver only, so the
    provider route works for driver-side tokenization but not inside
    pandas UDFs running in separate worker processes."""
    model = model or _load_model(model_location)
    return s.fillna("").map(
        lambda x: list(model.predict(x, top_k, threshold))
    )


def nearest_neighbors_analyzer(
    s: pd.Series,
    model_location: str = "",
    top_k: int = 1,
    model: Model | None = None,
) -> pd.Series:
    """See :func:`classification_analyzer` for the ``model=`` executor
    route vs the driver-only provider hook."""
    model = model or _load_model(model_location)
    memo: dict[str, list[str]] = {}

    def expand(x: str) -> list[str]:
        out: list[str] = []
        for w in x.split():
            nn = memo.get(w)
            if nn is None:
                nn = list(model.get_nn(w, top_k))
                memo[w] = nn
            out.extend(nn)
        return out

    return s.fillna("").map(expand)
