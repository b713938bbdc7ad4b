"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Design for a training-data pipeline at 100 TB: media assets travel as
``binary`` columns with a typed ``meta`` struct; all per-asset work
(decode, feature extraction, resize, frame sampling) runs in Arrow-batched
``mapInPandas`` kernels so payload bytes never surface row-at-a-time in
Python. Real media codecs (PIL / libav / soundfile) are NOT available in
this environment, so decoding is pluggable: :func:`register_decoder`
installs a codec for a ``kind``; the built-in ``raw`` decoder interprets
the payload as a deterministic uint8 buffer (our synthetic assets), and
asking for an unregistered real codec raises ``NotImplementedError`` at
kernel-build time, not per batch.

The Spark-side plumbing — schemas, batch shapes, row-exploding frame
sampling, partitioning — is real and tested; only the codec byte-math is
a stand-in.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_META_SCHEMA = (
    "width int, height int, channels int, sample_rate int, n_frames int, "
    "codec string"
)
ASSET_SCHEMA = f"asset_id long, kind string, data binary, meta struct<{ASSET_META_SCHEMA}>"

# decoder: (payload bytes, meta row dict) -> numpy array (shape by kind)
Decoder = Callable[[bytes, dict], np.ndarray]

_DECODERS: dict[str, Decoder] = {}


def register_decoder(kind: str, fn: Decoder) -> None:
    _DECODERS[kind] = fn


def get_decoder(kind: str) -> Decoder:
    if kind not in _DECODERS:
        raise NotImplementedError(
            f"no decoder registered for kind={kind!r}; real codecs (PIL/libav)"
            " are not available in this environment — register one with"
            " register_decoder()"
        )
    return _DECODERS[kind]


def _raw_decoder(payload: bytes, meta: dict) -> np.ndarray:
    """Deterministic stand-in codec: payload bytes ARE the sample buffer.

    images -> (height, width, channels) uint8 (truncated/tiled to fit);
    audio  -> (n_samples,) uint8; video -> (n_frames, height, width) uint8.
    """
    buf = np.frombuffer(payload, dtype=np.uint8)
    h, w, c = meta.get("height") or 1, meta.get("width") or 1, meta.get("channels") or 1
    nf = meta.get("n_frames") or 0
    if nf:
        need = nf * h * w
    else:
        need = h * w * c
    if buf.size == 0:
        buf = np.zeros(1, dtype=np.uint8)
    reps = -(-need // buf.size)  # ceil
    buf = np.tile(buf, reps)[:need]
    if nf:
        return buf.reshape(nf, h, w)
    return buf.reshape(h, w, c)


register_decoder("raw", _raw_decoder)


def assets_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Deterministic asset table derived from the documents corpus: the text
    bytes become the payload, metadata derives from byte length. Gives the
    multimodal kernels a real, reproducible binary column (and the metadata
    op a SQL oracle) without external data."""
    data = F.encode(F.coalesce(F.col("text"), F.lit("")), "UTF-8")
    nbytes = F.octet_length(data)
    width = F.greatest(F.lit(1), F.pmod(nbytes, F.lit(64)) + F.lit(1))
    height = F.greatest(F.lit(1), (nbytes / width).cast("int"))
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit(kind).alias("kind"),
        data.alias("data"),
        F.struct(
            width.cast("int").alias("width"),
            height.cast("int").alias("height"),
            F.lit(1).alias("channels"),
            F.when(F.lit(kind) == "audio", F.lit(16000)).otherwise(F.lit(0)).alias("sample_rate"),
            F.when(F.lit(kind) == "video", F.pmod(nbytes, F.lit(7)) + F.lit(2))
            .otherwise(F.lit(0))
            .cast("int")
            .alias("n_frames"),
            F.lit("raw").alias("codec"),
        ).alias("meta"),
    )


def decode_meta(assets: DataFrame) -> DataFrame:
    """Payload-level metadata: byte size + content digest per asset.

    JVM-side (no Python): the cheap integrity/statistics pass a pipeline
    runs before spending decode cycles."""
    return assets.select(
        "asset_id",
        "kind",
        F.octet_length("data").alias("n_bytes"),
        F.sha2("data", 256).alias("digest"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def image_features(assets: DataFrame, n_buckets: int = 16) -> DataFrame:
    """Decode each image and emit a byte-histogram feature vector
    (n_buckets coarse luminance buckets, L1-normalized float) plus mean
    luminance — the shape of a real featurizer, on the stub codec."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats, means = [], [], []
            for row in pdf.itertuples(index=False):
                dec = get_decoder(row.meta.get("codec") or row.kind)
                img = dec(row.data, dict(row.meta))
                hist = np.bincount(
                    (img.ravel() >> 4).astype(np.int64), minlength=16
                )[:16].astype(np.float64)
                if n_buckets != 16:
                    hist = hist.reshape(n_buckets, -1).sum(axis=1)
                total = hist.sum() or 1.0
                ids.append(row.asset_id)
                feats.append((hist / total).round(6).tolist())
                means.append(round(float(img.mean()), 4))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "features": feats,
                    "mean_luma": pd.Series(means, dtype="float64"),
                }
            )

    return assets.mapInPandas(
        kernel, schema="asset_id long, features array<double>, mean_luma double"
    )


def image_resize(assets: DataFrame, out_h: int = 8, out_w: int = 8) -> DataFrame:
    """Block-mean resize to (out_h, out_w); emits the resized buffer as a
    binary column (uint8), preserving the opaque-payload convention."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for row in pdf.itertuples(index=False):
                dec = get_decoder(row.meta.get("codec") or row.kind)
                img = dec(row.data, dict(row.meta)).astype(np.float64)
                h, w = img.shape[0], img.shape[1]
                ys = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
                xs = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
                small = img[ys][:, xs].mean(axis=-1) if img.ndim == 3 else img[ys][:, xs]
                ids.append(row.asset_id)
                blobs.append(small.astype(np.uint8).tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "resized": blobs,
                    "out_h": pd.Series([out_h] * len(ids), dtype="int32"),
                    "out_w": pd.Series([out_w] * len(ids), dtype="int32"),
                }
            )

    return assets.mapInPandas(
        kernel, schema="asset_id long, resized binary, out_h int, out_w int"
    )


def frame_sample(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every n-th frame of video assets: one OUTPUT ROW PER FRAME
    (mapInPandas yielding more rows than it consumes — the explode shape
    for downstream per-frame featurizers)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, digests = [], [], []
            for row in pdf.itertuples(index=False):
                meta = dict(row.meta)
                if not meta.get("n_frames"):
                    continue
                dec = get_decoder(meta.get("codec") or row.kind)
                vid = dec(row.data, meta)
                for i in range(0, vid.shape[0], every_n):
                    ids.append(row.asset_id)
                    fidx.append(i)
                    digests.append(int(vid[i].sum()))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(fidx, dtype="int32"),
                    "frame_checksum": pd.Series(digests, dtype="int64"),
                }
            )

    return assets.mapInPandas(
        kernel, schema="asset_id long, frame_idx int, frame_checksum long"
    )


def audio_energy(assets: DataFrame, frame_len: int = 256) -> DataFrame:
    """Per-asset RMS energy over fixed-length windows of the sample buffer
    (vectorized reshape + mean — the plumbing of an audio featurizer)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_frames_out, rms = [], [], []
            for row in pdf.itertuples(index=False):
                dec = get_decoder(row.meta.get("codec") or row.kind)
                samples = dec(row.data, dict(row.meta)).ravel().astype(np.float64)
                n = (samples.size // frame_len) * frame_len
                if n == 0:
                    frames = samples[None, :]
                else:
                    frames = samples[:n].reshape(-1, frame_len)
                e = np.sqrt((frames**2).mean(axis=1))
                ids.append(row.asset_id)
                n_frames_out.append(frames.shape[0])
                rms.append(round(float(e.mean()), 4))
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(ids, dtype="int64"),
                    "n_windows": pd.Series(n_frames_out, dtype="int32"),
                    "mean_rms": pd.Series(rms, dtype="float64"),
                }
            )

    return assets.mapInPandas(
        kernel, schema="asset_id long, n_windows int, mean_rms double"
    )
