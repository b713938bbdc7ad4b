"""Multimodal plumbing: binary payload columns + typed meta through
mapInPandas kernels (stub codec, real Spark-side shapes)."""

import numpy as np
import pandas as pd
import pytest

from iresearch_spark.pipeline.multimodal import (
    _raw_decoder,
    assets_from_documents,
    audio_energy,
    decode_meta,
    frame_sample,
    get_decoder,
    image_features,
    image_resize,
)


@pytest.fixture(scope="module")
def docs_df(spark):
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["hello world " * 40, "tiny", ""],
            "lang": ["en"] * 3,
            "source": ["s0"] * 3,
            "n_chars": [480, 4, 0],
        }
    )
    return spark.createDataFrame(pdf)


def test_unregistered_codec_raises():
    with pytest.raises(NotImplementedError):
        get_decoder("jpeg")


def test_raw_decoder_shapes():
    img = _raw_decoder(b"\x01\x02\x03\x04", {"height": 2, "width": 3, "channels": 1})
    assert img.shape == (2, 3, 1)
    vid = _raw_decoder(b"\x01\x02", {"height": 2, "width": 2, "n_frames": 3})
    assert vid.shape == (3, 2, 2)


def test_decode_meta_matches_source(spark, docs_df):
    out = decode_meta(assets_from_documents(docs_df)).toPandas()
    assert sorted(out["asset_id"]) == [1, 2, 3]
    m = out.set_index("asset_id")
    assert int(m.loc[1, "n_bytes"]) == 480
    assert int(m.loc[3, "n_bytes"]) == 0
    # geometry is consistent with payload size
    assert all(m["width"] >= 1) and all(m["height"] >= 1)


def test_image_features_normalized(spark, docs_df):
    out = image_features(assets_from_documents(docs_df)).toPandas()
    assert len(out) == 3
    for f in out["features"]:
        assert len(f) == 16
        assert abs(sum(f) - 1.0) < 1e-4
    assert (out["mean_luma"] >= 0).all() and (out["mean_luma"] <= 255).all()


def test_image_resize_buffer_size(spark, docs_df):
    out = image_resize(assets_from_documents(docs_df), 8, 8).toPandas()
    for b in out["resized"]:
        assert len(bytes(b)) == 64


def test_frame_sample_explodes_rows(spark, docs_df):
    assets = assets_from_documents(docs_df, kind="video")
    out = frame_sample(assets, every_n=2).toPandas()
    # every video asset contributes ceil(n_frames / 2) rows
    meta = assets.select("asset_id", "meta.n_frames").toPandas()
    expected = int(sum(-(-n // 2) for n in meta["n_frames"]))
    assert len(out) == expected
    assert (out["frame_idx"] % 2 == 0).all()


def test_audio_energy_runs(spark, docs_df):
    out = audio_energy(assets_from_documents(docs_df, kind="audio")).toPandas()
    assert len(out) == 3
    assert (out["mean_rms"] >= 0).all()


def test_deterministic_across_partitioning(spark, docs_df):
    a1 = image_features(assets_from_documents(docs_df).repartition(1)).toPandas()
    a4 = image_features(assets_from_documents(docs_df).repartition(4)).toPandas()
    s1 = a1.sort_values("asset_id").reset_index(drop=True)
    s4 = a4.sort_values("asset_id").reset_index(drop=True)
    assert s1["mean_luma"].tolist() == s4["mean_luma"].tolist()
    assert s1["features"].map(tuple).tolist() == s4["features"].map(tuple).tolist()
