"""Image artifact sink tests (sinks/media.py): byte-equal PNG round
trip + exactly-once resume — the S3 disposition from SURVEY.md
(reference writes region PNGs to disk, utils.py:111-117)."""

import base64
import os

import pytest
from pyspark.sql import functions as F

from vision_parse_spark import ExtractConfig, extract
from vision_parse_spark.operators.images import (
    extract_images_from_marker_text,
)
from vision_parse_spark.sinks.media import (
    media_table,
    read_media,
    write_media,
)
from vision_parse_spark.synth import synth_transcripts_spark

N_TURNS = 600  # enough synthetic turns to contain imaged payloads


@pytest.fixture(scope="module")
def extracted(spark):
    df = synth_transcripts_spark(spark, N_TURNS, partitions=4)
    return extract(df, ExtractConfig(image_mode="base64")).persist()


def test_media_table_shape(spark, extracted):
    m = media_table(extracted)
    assert m.columns == ["conv_id", "turn_idx", "image_idx",
                         "image_url", "png"]
    rows = m.limit(5).collect()
    assert rows, "synthetic corpus should contain imaged turns"
    for r in rows:
        assert isinstance(r["png"], (bytes, bytearray))
        assert bytes(r["png"][:8]) == b"\x89PNG\r\n\x1a\n"  # real PNG magic


def test_round_trip_byte_equal(spark, extracted, tmp_path):
    """Written artifact bytes == the driver-side extraction of the
    same turn's payload (full fidelity through explode+unbase64+
    parquet binary and back)."""
    path = str(tmp_path / "media")
    write_media(extracted, path, n_buckets=4)
    back = read_media(spark, path)
    sample = back.orderBy("conv_id", "turn_idx", "image_idx").limit(3).collect()
    src = extracted.select("conv_id", "turn_idx", "images")
    for r in sample:
        turn = src.filter(
            (F.col("conv_id") == r["conv_id"])
            & (F.col("turn_idx") == r["turn_idx"])
        ).first()
        want_b64 = turn["images"][r["image_idx"]]["base64_encoded"]
        want = base64.b64decode(want_b64.split(",", 1)[1])
        assert bytes(r["png"]) == want


def test_url_mode_rows_carry_no_artifacts(spark):
    df = synth_transcripts_spark(spark, 200, partitions=2)
    out = extract(df, ExtractConfig(image_mode="url"))
    assert media_table(out).count() == 0


def test_media_resume_exactly_once(spark, extracted, tmp_path):
    path = str(tmp_path / "media")
    write_media(extracted, path, run_id="r1", n_buckets=4)
    total = read_media(spark, path).count()
    assert total > 0
    # simulate dying before committing bucket 2
    os.remove(os.path.join(path, "_lineage", "bucket_00002.json"))
    summary = write_media(extracted, path, run_id="r2", n_buckets=4)
    assert summary["written"] == [2]
    back = read_media(spark, path)
    assert back.count() == total
    assert back.select("conv_id", "turn_idx", "image_idx") \
               .distinct().count() == total


def test_artifact_matches_direct_extraction(spark, extracted, tmp_path):
    """End-to-end parity with the per-entity extractor: pick one imaged
    turn, re-run extract_images_from_marker_text on its raw text, and
    compare artifact bytes."""
    df = synth_transcripts_spark(spark, N_TURNS, partitions=4)
    m = media_table(extracted)
    one = m.first()
    raw = df.filter(
        (F.col("conv_id") == one["conv_id"])
        & (F.col("turn_idx") == one["turn_idx"])
    ).first()
    imgs = extract_images_from_marker_text(
        raw["text"], "base64", int(one["turn_idx"]))
    want = base64.b64decode(
        imgs[one["image_idx"]]["base64_encoded"].split(",", 1)[1])
    assert bytes(one["png"]) == want


def test_pdf_embedded_image_reaches_media_sink(spark, tmp_path):
    """VERDICT round-2 item 5 end-to-end: a pdf payload with an
    embedded /Image XObject emits the reference-named markdown link
    AND a byte-equal media-sink row (decode -> region detect -> crop
    -> PNG encode -> explode -> bucketed write -> read back)."""
    import base64

    import numpy as np

    from vision_parse_spark import ExtractConfig, extract
    from vision_parse_spark.functions.pdf import make_pdf_bytes

    grad = np.linspace(60, 200, 160).astype(np.uint8)
    block = np.repeat(np.broadcast_to(grad, (120, 160))[:, :, None],
                      3, axis=2)
    payload = make_pdf_bytes(
        [["pdf with picture", "body line"]], images={0: block}
    ).decode("latin-1")
    df = spark.createDataFrame(
        [("c0", 0, payload)], ["conv_id", "turn_idx", "text"])
    out = extract(df, ExtractConfig(image_mode="base64"))
    row = out.collect()[0]
    assert row.status == "ok"
    assert len(row.images) == 1
    assert row.images[0]["image_url"] == "image_1_1.png"  # pdf page 0
    assert "![image_1_1.png](data:image/png;base64," in row.markdown

    path = str(tmp_path / "media")
    write_media(out, path, n_buckets=4)
    back = read_media(spark, path).collect()
    assert len(back) == 1
    expect = base64.b64decode(
        row.images[0]["base64_encoded"].split(",", 1)[1])
    assert bytes(back[0].png) == expect


def test_synth_pdf_image_rows_flow_through_pipeline(spark):
    """The synth generator's pdf-with-image quarter produces turns
    whose extraction emits image entries from the EMBEDDED channel."""
    from pyspark.sql import functions as F

    from vision_parse_spark import ExtractConfig, extract
    from vision_parse_spark.synth import synth_transcripts_spark

    df = synth_transcripts_spark(spark, 3000, partitions=4)
    pdf_img = df.filter(
        F.col("text").startswith("%PDF-")
        & F.col("text").contains("/Subtype /Image"))
    n = pdf_img.count()
    assert n > 0, "synth must emit pdf-with-image payloads"
    out = extract(pdf_img, ExtractConfig(image_mode="url"))
    with_imgs = out.filter(F.size("images") > 0)
    assert with_imgs.count() == n
    assert out.filter(~F.col("markdown").contains("![image_1_1.png]")) \
        .count() == 0


def test_vector_figure_turn_emits_images_and_media_row(spark, tmp_path):
    """Round-4 acceptance (VERDICT missing #1): a turn whose PDF
    payload draws a VECTOR figure (path fills, no raster XObject)
    emits an `images` entry through extract and lands a PNG artifact
    row in the media sink."""
    from vision_parse_spark.functions.pdf import make_pdf_bytes

    payload = make_pdf_bytes(
        [["quarterly results", "the chart below shows the split"]],
        vector_figures=[0],
    ).decode("latin-1")
    df = spark.createDataFrame(
        [("conv-vec", 0, "assistant", payload, None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    out = extract(df, ExtractConfig(image_mode="base64"))
    row = out.first()
    assert row["status"] == "ok"
    assert [d["image_url"] for d in row["images"]] == ["image_1_1.png"]
    assert "![image_1_1.png](" in row["markdown"]

    path = str(tmp_path / "media")
    write_media(out, path, n_buckets=2)
    back = read_media(spark, path).collect()
    assert len(back) == 1
    assert back[0]["image_url"] == "image_1_1.png"
    assert bytes(back[0]["png"][:8]) == b"\x89PNG\r\n\x1a\n"
