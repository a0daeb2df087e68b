"""S3 disposition — the image ARTIFACT sink.

The reference writes each extracted region to disk as a PNG file
(``/root/reference/src/vision_parse/utils.py:111-117``); SURVEY S3
lifts that to "a separate DataFrame write to object storage".  This
module is that write: the in-row ``images`` array (produced with
``image_mode="base64"``) exploded to a first-class media table

    (conv_id, turn_idx, image_idx, image_url, png: binary)

and persisted through the same bucketed MERGE emulation as the text
results (``sinks/merge.py``), so media inherits the identical
exactly-once resume + per-bucket lineage/checksum contract.

Scale notes: the explode is a narrow Generate; the only shuffle is the
sink's own bucket partitioning.  PNG bytes travel as a binary column —
at 100 TB the parquet files ARE the object store (one row per artifact
beats millions of small files for downstream scans)."""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import merge_write, read_merged

_B64_PREFIX = "^data:image/png;base64,"

MEDIA_KEY = ("conv_id", "turn_idx", "image_idx")


def media_table(extracted: DataFrame) -> DataFrame:
    """Explode extraction output into one row per image artifact.

    Artifact bytes exist only for rows produced with
    ``image_mode="base64"`` (the data-URI variant); ``"url"``-mode
    entries carry a name but no bytes and are filtered out — there is
    nothing to persist for them."""
    exploded = extracted.select(
        "conv_id", "turn_idx",
        F.posexplode("images").alias("image_idx", "_img"),
    ).filter(F.col("_img.base64_encoded").isNotNull())
    return exploded.select(
        "conv_id", "turn_idx", "image_idx",
        F.col("_img.image_url").alias("image_url"),
        F.unbase64(
            F.regexp_replace(F.col("_img.base64_encoded"), _B64_PREFIX, "")
        ).alias("png"),
    )


def write_media(
    extracted: DataFrame,
    path: str,
    run_id: str = "run-0",
    n_buckets: int = 16,
) -> dict:
    """Write the media table with bucket-level exactly-once resume
    (same manifest contract as the text sink)."""
    return merge_write(
        media_table(extracted), path, run_id=run_id, n_buckets=n_buckets,
        key_cols=MEDIA_KEY, payload_col="png",
    )


def read_media(spark: SparkSession, path: str) -> DataFrame:
    """Committed media artifacts only (manifest-gated)."""
    return read_merged(spark, path)
