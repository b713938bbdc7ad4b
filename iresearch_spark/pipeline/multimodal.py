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


def _need_of(meta: dict) -> int:
    """Decoded element count implied by the meta struct."""
    h = meta.get("height") or 1
    w = meta.get("width") or 1
    c = meta.get("channels") or 1
    nf = meta.get("n_frames") or 0
    return nf * h * w if nf else h * w * c


def _batch_decode(pdf: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Decode a whole Arrow batch -> (flat uint8 buffer, per-asset starts).

    The ``raw`` codec decodes ALL assets in one vectorized gather over the
    concatenated payload bytes (np.frombuffer + modular index arithmetic —
    no per-row Python on the byte path). Registered real codecs are
    inherently per-asset; they fall back to a loop and are concatenated
    into the same flat shape, so every featurizer downstream is
    codec-agnostic and vectorized."""
    metas = pdf["meta"].tolist()
    kinds = pdf["kind"].tolist()
    needs = np.array([_need_of(m) for m in metas], dtype=np.int64)
    codecs = {
        (m.get("codec") or k) for m, k in zip(metas, kinds)
    }
    starts = np.concatenate([[0], np.cumsum(needs)])
    if codecs <= {"raw"}:
        payloads = [p or b"\x00" for p in pdf["data"].tolist()]
        lens = np.array([len(p) for p in payloads], dtype=np.int64)
        pay_starts = np.concatenate([[0], np.cumsum(lens)])[:-1]
        concat = np.frombuffer(b"".join(payloads), dtype=np.uint8)
        total = int(needs.sum())
        intra = np.arange(total, dtype=np.int64) - np.repeat(
            starts[:-1], needs
        )
        src = np.repeat(pay_starts, needs) + intra % np.repeat(lens, needs)
        return concat[src], starts
    parts = []
    for row in pdf.itertuples(index=False):
        dec = get_decoder(row.meta.get("codec") or row.kind)
        parts.append(dec(row.data, dict(row.meta)).ravel())
    flat = (
        np.concatenate(parts).astype(np.uint8)
        if parts
        else np.empty(0, np.uint8)
    )
    return flat, starts


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
            if pdf.empty:
                continue
            n = len(pdf)
            flat, starts = _batch_decode(pdf)
            needs = np.diff(starts)
            asset_of = np.repeat(np.arange(n, dtype=np.int64), needs)
            # per-asset 16-bucket histogram in ONE scatter-add
            hist = np.zeros((n, 16), dtype=np.float64)
            np.add.at(hist, (asset_of, (flat >> 4).astype(np.int64)), 1.0)
            if n_buckets != 16:
                hist = hist.reshape(n, n_buckets, -1).sum(axis=2)
            totals = hist.sum(axis=1)
            totals[totals == 0.0] = 1.0
            feats = (hist / totals[:, None]).round(6)
            sums = np.add.reduceat(flat.astype(np.float64), starts[:-1])
            means = np.round(sums / np.maximum(needs, 1), 4)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64").to_numpy(),
                    "features": list(feats),
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
            if pdf.empty:
                continue
            n = len(pdf)
            flat, starts = _batch_decode(pdf)
            metas = pdf["meta"].tolist()
            h = np.array([m.get("height") or 1 for m in metas], np.int64)
            w = np.array([m.get("width") or 1 for m in metas], np.int64)
            c = np.array([m.get("channels") or 1 for m in metas], np.int64)
            # nearest-pixel sample grid, all assets at once: (n, out_h/out_w)
            ys = np.minimum(
                (np.arange(out_h, dtype=np.int64)[None, :] * h[:, None])
                // out_h,
                h[:, None] - 1,
            )
            xs = np.minimum(
                (np.arange(out_w, dtype=np.int64)[None, :] * w[:, None])
                // out_w,
                w[:, None] - 1,
            )
            # pixel index (channel-major gather, mean over channels)
            base = (
                starts[:-1][:, None, None]
                + (ys[:, :, None] * w[:, None, None] + xs[:, None, :])
                * c[:, None, None]
            )
            acc = np.zeros((n, out_h, out_w), dtype=np.float64)
            for ch in range(int(c.max())):
                sel = c > ch
                acc[sel] += flat[base[sel] + ch]
            small = (acc / c[:, None, None]).astype(np.uint8)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64").to_numpy(),
                    "resized": [r.tobytes() for r in small],
                    "out_h": pd.Series([out_h] * n, dtype="int32"),
                    "out_w": pd.Series([out_w] * n, dtype="int32"),
                }
            )

    return assets.mapInPandas(
        kernel, schema="asset_id long, resized binary, out_h int, out_w int"
    )


def frame_sample(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every n-th frame of video assets: one OUTPUT ROW PER FRAME
    (mapInPandas yielding more rows than it consumes — the explode shape
    for downstream per-frame featurizers)."""

    empty = pd.DataFrame(
        {
            "asset_id": pd.Series([], dtype="int64"),
            "frame_idx": pd.Series([], dtype="int32"),
            "frame_checksum": pd.Series([], dtype="int64"),
        }
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[
                pdf["meta"].map(lambda m: bool(m.get("n_frames")))
            ].reset_index(drop=True)
            if pdf.empty:
                yield empty
                continue
            n = len(pdf)
            flat, starts = _batch_decode(pdf)
            metas = pdf["meta"].tolist()
            nf = np.array([m["n_frames"] for m in metas], np.int64)
            fsz = np.array(
                [(m.get("height") or 1) * (m.get("width") or 1) for m in metas],
                np.int64,
            )
            # global frame boundaries -> one reduceat for ALL checksums
            total_frames = int(nf.sum())
            f_asset = np.repeat(np.arange(n, dtype=np.int64), nf)
            f_off = np.concatenate([[0], np.cumsum(nf)])[:-1]
            f_idx = np.arange(total_frames, dtype=np.int64) - np.repeat(
                f_off, nf
            )
            f_starts = starts[:-1][f_asset] + f_idx * fsz[f_asset]
            sums = np.add.reduceat(flat.astype(np.int64), f_starts)
            keep = f_idx % every_n == 0
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"]
                    .astype("int64")
                    .to_numpy()[f_asset[keep]],
                    "frame_idx": pd.Series(f_idx[keep], dtype="int32"),
                    "frame_checksum": pd.Series(sums[keep], dtype="int64"),
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
            if pdf.empty:
                continue
            n = len(pdf)
            flat, starts = _batch_decode(pdf)
            needs = np.diff(starts)
            # segment layout per asset: w full windows (+1 remainder seg to
            # DISCARD when rem>0); assets shorter than one window get a
            # single whole-buffer window
            w = needs // frame_len
            rem = needs - w * frame_len
            has_rem = (w > 0) & (rem > 0)
            seg_counts = np.where(w > 0, w + has_rem, 1)
            total_segs = int(seg_counts.sum())
            seg_off = np.concatenate([[0], np.cumsum(seg_counts)])[:-1]
            sizes = np.full(total_segs, frame_len, dtype=np.int64)
            last = seg_off + seg_counts - 1
            sizes[last[w == 0]] = needs[w == 0]
            sizes[last[has_rem]] = rem[has_rem]
            seg_starts = np.concatenate([[0], np.cumsum(sizes)])[:-1]
            sq = flat.astype(np.float64) ** 2
            seg_sums = np.add.reduceat(sq, seg_starts)
            rms = np.sqrt(seg_sums / sizes)
            keep = np.ones(total_segs, dtype=bool)
            keep[last[has_rem]] = False
            asset_of_seg = np.repeat(np.arange(n, dtype=np.int64), seg_counts)
            n_windows = seg_counts - has_rem
            rms_sum = np.zeros(n, dtype=np.float64)
            np.add.at(rms_sum, asset_of_seg[keep], rms[keep])
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].astype("int64").to_numpy(),
                    "n_windows": pd.Series(n_windows, dtype="int32"),
                    "mean_rms": pd.Series(
                        np.round(rms_sum / n_windows, 4), dtype="float64"
                    ),
                }
            )

    return assets.mapInPandas(
        kernel, schema="asset_id long, n_windows int, mean_rms double"
    )
