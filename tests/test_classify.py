"""T4 classifier unit tests — mirrors the ImageDescription contract
(/root/reference/src/vision_parse/llm.py:17-24) per payload kind
(FIXTURES.md §2)."""

import pandas as pd

from vision_parse_spark.functions.classify import classify_batch, detect_payload_kind


def _one(text):
    return classify_batch(pd.Series([text])).iloc[0]


def test_payload_kind_detection():
    s = pd.Series(["%PDF-1.7\nhello", "<html><body><p>x</p></body></html>", "plain words"])
    assert list(detect_payload_kind(s)) == ["pdf_text", "html", "plain"]


def test_empty_detection():
    # P1 input condition: whitespace-only -> text_detected False
    for t in ["", "   ", "\n\n", " \t \n"]:
        r = _one(t)
        assert not r.text_detected
        assert r.confidence == 0.0


def test_table_detection_aligned_and_html():
    aligned = "name      count\nfoo      12\nbar      34\n"
    assert _one(aligned).tables_detected
    html = "<html><body><table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table></body></html>"
    assert _one(html).tables_detected
    assert not _one("just plain prose here.").tables_detected


def test_latex_detection():
    assert _one("inline $x^2$ math").latex_detected
    assert _one("block\n$$\\sum_i x_i$$\n").latex_detected
    # a lone $ amount with no closing $ on the same line is not math
    assert not _one("costs $5 and\nanother line of prose.").latex_detected
    assert not _one("no math at all.").latex_detected


def test_image_marker_detection_and_removal():
    r = _one("para text.\n\n[[PAGE_IMAGE w=120 h=150 seed=7]]\n")
    assert r.images_detected
    assert "[[PAGE_IMAGE" not in r.extracted_text


def test_pdf_header_stripped():
    r = _one("%PDF-1.4\nactual text layer content here.")
    assert r.extracted_text == "actual text layer content here."


def test_confidence_penalized_for_unformatted_structure():
    plain = _one("two plain sentences of ordinary prose. nothing special here.")
    structured = _one("TITLE SECTION\n* bullet one\n* bullet two")
    assert plain.confidence > 0.6
    assert structured.confidence <= 0.6


def test_fallback_defaults_shape():
    # C4 fallback record (llm.py:371-377): tables=Yes, latex=No, conf=0.0
    from vision_parse_spark.operators.pipeline import _fallback_analysis

    fb = _fallback_analysis(pd.Series(["some text"]))
    assert bool(fb.tables_detected.iloc[0]) is True
    assert bool(fb.latex_detected.iloc[0]) is False
    assert float(fb.confidence.iloc[0]) == 0.0
