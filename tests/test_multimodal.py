"""Multimodal binary-column plumbing tests: real PNG round-trip,
feature extraction over mapInPandas, stubbed codecs as error-as-data,
resize + frame sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from vision_parse_spark.operators.images import encode_png, render_page
from vision_parse_spark.operators.multimodal import (
    decode_jpeg,
    decode_png,
    image_features,
    resize_nearest,
    sample_frames,
    synth_media,
)


def test_png_roundtrip():
    page = render_page(140, 120, seed=9)
    rgb = page[..., ::-1].copy()
    assert np.array_equal(decode_png(encode_png(rgb)), rgb)


def test_decode_rejects_non_png():
    with pytest.raises(ValueError):
        decode_png(b"not a png at all")


def test_jpeg_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"\xff\xd8")


def test_resize_nearest():
    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    out = resize_nearest(img, 2, 3)
    assert out.shape == (2, 3, 3)
    assert np.array_equal(out[0, 0], img[0, 0])


def test_sample_frames():
    h = w = 4
    nf = 10
    payload = (bytes(range(256)) * (h * w * 3 * nf // 256 + 1))[: h * w * 3 * nf]
    frames = sample_frames(payload, h, w, nf, every=3)
    assert len(frames) == 4  # 0,3,6,9
    assert frames[0].shape == (4, 4, 3)


def test_image_features_pipeline(spark):
    media = synth_media(spark, 21, partitions=3)
    feats = image_features(media).collect()
    assert len(feats) == 21
    ok = [r for r in feats if r.status == "ok"]
    err = [r for r in feats if r.status == "error"]
    # jpeg-stub rows (i%7==6) and raw-frames rows (i%7==5) error out
    assert len(err) == 6 and len(ok) == 15
    assert all("NotImplementedError" in r.error for r in err
               if "jpeg" in (r.error or "") or True)
    r = ok[0]
    assert r.width >= 110 and r.height >= 110
    assert len(r.mean_rgb) == 3 and len(r.hist16) == 16
    assert sum(r.hist16) == r.width * r.height * 3
    # white page dominates -> high mean
    assert all(m > 150 for m in r.mean_rgb)


def test_media_schema_stable(spark):
    media = synth_media(spark, 7)
    assert [f.name for f in media.schema.fields] == [
        "media_id", "kind", "codec", "width", "height", "n_frames", "payload",
    ]
    assert media.filter(F.col("codec") == "png").count() == 5
