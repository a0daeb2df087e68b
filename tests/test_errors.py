"""C8/P6 error-surface tests — the lift of the reference's error-path
unit tests (tests/test_parser.py:12-27,49-59) to error-as-data plus
strict-mode raises."""

import pandas as pd
import pytest

from vision_parse_spark import ExtractConfig, extract_pandas
from vision_parse_spark.errors import (
    UnsupportedPayloadError,
    VisionParseSparkError,
)
from vision_parse_spark.functions.classify import detect_payload_kind

BINARY = "\x00\x01\x02\x03PK\x00\x04 compressed junk \x00\x05"
MOSTLY_CTRL = "\x01\x02\x03\x04\x05\x06ab"


def test_binary_payload_detected():
    kinds = detect_payload_kind(pd.Series([BINARY, MOSTLY_CTRL, "plain ok."]))
    assert list(kinds) == ["binary", "binary", "plain"]


def test_pdf_header_not_binary():
    # %PDF- payloads stay pdf_text even with control chars inside
    kinds = detect_payload_kind(pd.Series(["%PDF-1.4\n\x00\x00stream"]))
    assert list(kinds) == ["pdf_text"]


def test_unsupported_payload_error_as_data():
    pdf = pd.DataFrame({"conv_id": ["c"] * 2, "turn_idx": [0, 1],
                        "text": [BINARY, "fine text."]})
    out = extract_pandas(pdf, ExtractConfig())
    assert len(out) == 2  # row kept
    assert list(out.status) == ["unsupported", "ok"]
    assert out.markdown.iloc[0] == ""
    assert out.markdown.iloc[1] == "fine text."


def test_strict_mode_raises_like_reference():
    # parser.py:157-161 raises UnsupportedFileError on bad input
    pdf = pd.DataFrame({"conv_id": ["c"], "turn_idx": [0], "text": [BINARY]})
    with pytest.raises(UnsupportedPayloadError):
        extract_pandas(pdf, ExtractConfig(strict=True))


def test_error_taxonomy_hierarchy():
    assert issubclass(UnsupportedPayloadError, VisionParseSparkError)


def test_newlines_tabs_not_binary():
    kinds = detect_payload_kind(pd.Series(["line one\nline two\ttabbed\r\n"]))
    assert list(kinds) == ["plain"]
