"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Training-data-pipeline addition.  Design at 100 TB: media bytes live
in a ``binary`` column (or object-store pointers), metadata in a typed
struct; decode/feature ops run per Arrow batch on executors, bounded
by ``arrow.maxRecordsPerBatch`` so one batch of decoded frames fits in
memory.

Real here (stdlib/numpy only):
* PNG encode/decode round-trip (our minimal filter-0 codec — decode of
  arbitrary external PNGs with other filter types raises),
* image feature extraction (per-channel mean/std/histogram),
* nearest-neighbor resize,
* deterministic frame sampling over a concatenated-frames "video".

STUBBED (libs not in this container, Spark plumbing still real):
* JPEG/WebP decode, audio decode -> ``NotImplementedError`` with a
  clear message; gate callers on ``codec`` metadata.
"""

from __future__ import annotations

import struct
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

from .images import encode_png, render_page

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),     # image|video|audio
        StructField("codec", StringType(), False),    # png|jpeg|raw-frames|pcm
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("mean_rgb", ArrayType(DoubleType()), True),
        StructField("std_rgb", ArrayType(DoubleType()), True),
        StructField("hist16", ArrayType(LongType()), True),
        StructField("status", StringType(), True),
        StructField("error", StringType(), True),
    ]
)


def decode_png(png: bytes) -> np.ndarray:
    """Minimal PNG decoder for 8-bit RGB, filter type 0 scanlines (the
    format our encoder emits).  Other color types / filters raise."""
    if png[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    pos, w, h, depth, ctype = 8, 0, 0, 0, 0
    idat = b""
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        data = png[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", data[:10])
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + length
    if (depth, ctype) != (8, 2):
        raise NotImplementedError(
            f"only 8-bit RGB PNGs supported (depth={depth} ctype={ctype})"
        )
    raw = zlib.decompress(idat)
    stride = 1 + w * 3
    img = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row = raw[i * stride : (i + 1) * stride]
        if row[0] != 0:
            raise NotImplementedError(f"PNG filter type {row[0]} unsupported")
        img[i] = np.frombuffer(row[1:], dtype=np.uint8).reshape(w, 3)
    return img


def decode_jpeg(_: bytes) -> np.ndarray:
    raise NotImplementedError(
        "JPEG decode requires an image codec library not present in this "
        "environment; plug a decoder in here (schema/batching unchanged)"
    )


def decode_audio(_: bytes) -> np.ndarray:
    raise NotImplementedError(
        "audio decode requires an audio library not present in this "
        "environment; plug a decoder in here (schema/batching unchanged)"
    )


def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize (pure numpy indexing)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys[:, None], xs[None, :]]


def sample_frames(payload: bytes, h: int, w: int, n_frames: int,
                  every: int) -> list[np.ndarray]:
    """Deterministic frame sampling over a raw-frames 'video' payload
    (concatenated h*w*3 frames): frames 0, every, 2*every, ..."""
    frame_bytes = h * w * 3
    out = []
    for i in range(0, n_frames, every):
        chunk = payload[i * frame_bytes : (i + 1) * frame_bytes]
        if len(chunk) < frame_bytes:
            break
        out.append(np.frombuffer(chunk, dtype=np.uint8).reshape(h, w, 3))
    return out


def image_features(media: DataFrame, hist_bins: int = 16) -> DataFrame:
    """Decode PNG payloads and emit per-image features — the canonical
    binary-column mapInPandas stage (decode is per-entity; everything
    after is numpy)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, codec, payload in zip(
                pdf["media_id"], pdf["codec"], pdf["payload"]
            ):
                row = {
                    "media_id": int(mid), "width": None, "height": None,
                    "mean_rgb": None, "std_rgb": None, "hist16": None,
                    "status": "ok", "error": None,
                }
                try:
                    if codec == "png":
                        img = decode_png(bytes(payload))
                    elif codec == "jpeg":
                        img = decode_jpeg(bytes(payload))
                    else:
                        raise NotImplementedError(f"codec {codec}")
                    row["height"], row["width"] = img.shape[:2]
                    flat = img.reshape(-1, 3).astype(np.float64)
                    row["mean_rgb"] = [float(x) for x in flat.mean(axis=0)]
                    row["std_rgb"] = [float(x) for x in flat.std(axis=0)]
                    hist, _ = np.histogram(img, bins=hist_bins, range=(0, 256))
                    row["hist16"] = [int(x) for x in hist]
                except Exception as e:  # error-as-data, poison-row safe
                    row["status"] = "error"
                    row["error"] = f"{type(e).__name__}: {e}"
                rows.append(row)
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return media.select("media_id", "codec", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def synth_media(spark, n: int, partitions: int = 4) -> DataFrame:
    """Deterministic synthetic media table: PNG images (real bytes via
    our encoder), one raw-frames video, one stubbed-codec row."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                if i % 7 == 6:
                    kind, codec = "image", "jpeg"  # stub path
                    payload, w, h, nf = b"\xff\xd8fakejpeg", 0, 0, None
                elif i % 7 == 5:
                    kind, codec = "video", "raw-frames"
                    h, w, nf = 8, 8, 12
                    rng = np.random.default_rng(i)
                    payload = rng.integers(
                        0, 255, size=(nf * h * w * 3), dtype=np.int64
                    ).astype(np.uint8).tobytes()
                else:
                    kind, codec = "image", "png"
                    page = render_page(110 + i % 40, 110 + i % 60, seed=i)
                    h, w = page.shape[:2]
                    nf = 1
                    payload = encode_png(page[..., ::-1])
                rows.append(
                    {"media_id": i, "kind": kind, "codec": codec,
                     "width": w, "height": h, "n_frames": nf,
                     "payload": payload}
                )
            yield pd.DataFrame(rows,
                               columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(0, n, 1, partitions).mapInPandas(gen, MEDIA_SCHEMA)
