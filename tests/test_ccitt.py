"""CCITT G4 decoder tests: hand-assembled bitstreams for each coding
mode (bit patterns written out from ITU-T T.4/T.6, independent of the
module's own tables) plus a structural test on a real scanned PDF."""

import os

import numpy as np
import pytest

from vision_parse_spark.functions.ccitt import decode_g4


def _bits_to_bytes(s: str) -> bytes:
    s = s.replace(" ", "")
    s = s + "0" * (-len(s) % 8)
    return bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))


def test_all_white_rows_via_horizontal_mode():
    # per row: H (001) + white-run 8 (10011) + black-run 0 (0000110111)
    row = "001 10011 0000110111"
    img = decode_g4(_bits_to_bytes(row * 2), columns=8, rows=2)
    assert img.shape == (2, 8)
    assert (img == 255).all()


def test_horizontal_and_vertical_modes():
    # row1: H + white 2 (0111) + black 4 (011), H + white 2 + black 0
    # row2: V0 V0 V0 (copy row1's transitions at 2, 6, and close at 8)
    # row3: H + white 8 + black 0 (all white again)
    stream = ("001 0111 011"
              " 001 0111 0000110111"
              " 1 1 1"
              " 001 10011 0000110111")
    img = decode_g4(_bits_to_bytes(stream), columns=8, rows=3)
    expect_black = np.zeros((3, 8), dtype=bool)
    expect_black[0, 2:6] = True
    expect_black[1, 2:6] = True
    assert np.array_equal(img == 0, expect_black)


def test_pass_mode_skips_reference_run():
    # columns=12.  row1: black [2,6) and [8,10):
    #   H + w2(0111) + b4(011); H + w2(0111) + b2(11); V0 closes at 12
    # row2: black only [8,10): PASS (0001) jumps a0 over the ref's
    #   first black run, then V0 V0 V0
    stream = ("001 0111 011 001 0111 11 1"
              " 0001 1 1 1")
    img = decode_g4(_bits_to_bytes(stream), columns=12, rows=2)
    expect_black = np.zeros((2, 12), dtype=bool)
    expect_black[0, 2:6] = True
    expect_black[0, 8:10] = True
    expect_black[1, 8:10] = True
    assert np.array_equal(img == 0, expect_black)


def test_vertical_offsets():
    # row1: black [4,8) of 12 -> H + w4(1011) + b4(011), V0 closes
    # row2: black [3,9): VL1 (010) on b1=4 -> a1=3; VR1 (011) on b1=8
    #   -> a1=9; V0 closes at 12
    stream = ("001 1011 011 1"
              " 010 011 1")
    img = decode_g4(_bits_to_bytes(stream), columns=12, rows=2)
    expect_black = np.zeros((2, 12), dtype=bool)
    expect_black[0, 4:8] = True
    expect_black[1, 3:9] = True
    assert np.array_equal(img == 0, expect_black)


def test_makeup_code_long_run():
    # 80-wide all-white row: H + white 80 (makeup 64 '11011' +
    # terminating 16 '101010') + black 0
    stream = "001 11011 101010 0000110111"
    img = decode_g4(_bits_to_bytes(stream), columns=80, rows=1)
    assert (img == 255).all()


def test_black_is_1_bit_sense():
    # same geometry as the H/V test; with black_is_1 the filter emits
    # bit 1 for coding-black and DeviceGray renders bit 1 white
    stream = "001 0111 011 001 0111 0000110111"
    img = decode_g4(_bits_to_bytes(stream), columns=8, rows=1,
                    black_is_1=True)
    assert (img[0, 2:6] == 255).all()
    assert (img[0, :2] == 0).all() and (img[0, 6:] == 0).all()


def test_row_count_mismatch_raises():
    stream = "001 10011 0000110111"
    with pytest.raises(ValueError):
        decode_g4(_bits_to_bytes(stream), columns=8, rows=5)


REFERENCE_PDF = "/root/reference/tests/Texas-Holdem-Rules.pdf"


@pytest.mark.skipif(not os.path.exists(REFERENCE_PDF),
                    reason="reference fixture not present")
def test_real_scanned_pdf_decodes_structurally():
    """The strong structural check: 3,326 rows x exactly 2,534 columns
    of real Pdftools-SDK G4 output decode to completion (any table or
    mode error desyncs within rows), and the result looks like a text
    page (a few percent visual black, margins present)."""
    from vision_parse_spark.functions.pdf import extract_pdf_images

    ims = extract_pdf_images(open(REFERENCE_PDF, "rb").read())
    assert len(ims) == 1
    page_idx, name, img = ims[0]
    assert (page_idx, name) == (0, "FXX1")
    assert img.shape == (3326, 2534)
    black_frac = float((img == 0).mean())
    assert 0.01 < black_frac < 0.2  # text page, not noise/inverted
    # margins: the outermost columns are overwhelmingly white
    assert (img[:, :20] == 255).mean() > 0.95


# ---------------------------------------------------------------------------
# round 4: G3 (/K >= 0) — test-side MH encoder drives the decoder
# ---------------------------------------------------------------------------


def _mh_run_code(run: int, white: bool) -> str:
    """T.4 run -> bit string (makeup(s) + terminator), from the
    decoder's own tables inverted."""
    from vision_parse_spark.functions.ccitt import (
        _BLACK_CODES, _EXT_MAKEUP, _WHITE_CODES,
    )

    inv = {v: k for k, v in
           (_WHITE_CODES if white else _BLACK_CODES).items()}
    inv_ext = {v: k for k, v in _EXT_MAKEUP.items()}
    out = ""
    while run >= 64:
        cap = min(run - run % 64, 2560)
        mk = inv_ext.get(cap) if cap > 1728 else inv.get(cap)
        if mk is None:  # fall back to largest table makeup
            cap = 1728
            mk = inv[cap]
        out += mk
        run -= cap
    return out + inv[run]


def _encode_g3_1d_row(row) -> str:
    import numpy as np

    bits = ""
    pos = 0
    white = True
    row = np.asarray(row, dtype=bool)
    n = len(row)
    while pos < n:
        run = 0
        while pos + run < n and row[pos + run] == (not white):
            run += 1
        bits += _mh_run_code(run, white)
        pos += run
        white = not white
    return bits


def _pack(bits: str) -> bytes:
    bits += "0" * (-len(bits) % 8)
    return bytes(int(bits[i:i + 8], 2) for i in range(0, len(bits), 8))


_EOL = "000000000001"


def _checker(h, w, seed=5):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(h, w)).astype(bool)


def test_g3_k0_plain_rows_round_trip():
    import numpy as np

    from vision_parse_spark.functions.ccitt import decode_g3

    img = _checker(6, 40)
    bits = "".join(_encode_g3_1d_row(r) for r in img)
    out = decode_g3(_pack(bits), columns=40, rows=6)
    # coding-black (True) renders BLACK (0) when black_is_1=False
    assert np.array_equal(out == 0, img)


def test_g3_k0_with_eols_and_rtc():
    import numpy as np

    from vision_parse_spark.functions.ccitt import decode_g3

    img = _checker(4, 33, seed=8)
    bits = _EOL + (_EOL.join(_encode_g3_1d_row(r) for r in img)) \
        + _EOL * 6
    out = decode_g3(_pack(bits), columns=33)
    assert out.shape == (4, 33)
    assert np.array_equal(out == 0, img)


def test_g3_k_positive_mixed_1d_2d():
    """K>0: tag bit after each EOL selects 1-D (1) or 2-D (0); the 2-D
    row is coded against the previous row with vertical modes (V0 =
    identical row)."""
    import numpy as np

    from vision_parse_spark.functions.ccitt import decode_g3

    row = np.zeros(24, dtype=bool)
    row[5:12] = True
    bits = _EOL + "1" + _encode_g3_1d_row(row)
    # second row identical, coded 2-D with V0s: transitions at 5 and
    # 12, then close at columns via V0 to b1=24
    bits += _EOL + "0" + "1" + "1" + "1"
    out = decode_g3(_pack(bits + _EOL * 6), columns=24, rows=2, k=4)
    assert np.array_equal(out[0], out[1])
    assert np.array_equal(out[0] == 0, row)


def test_g3_byte_align_gate():
    import pytest

    from vision_parse_spark.functions.ccitt import decode_g3

    with pytest.raises(NotImplementedError):
        decode_g3(b"\x00", columns=8, byte_align=True)


def test_g3_image_xobject_in_pdf():
    """A /CCITTFaxDecode /K 0 image XObject decodes through
    extract_pdf_images (the G3 branch; /K absent defaults to 0)."""
    import numpy as np

    from vision_parse_spark.functions.pdf import extract_pdf_images

    img = _checker(8, 32, seed=3)
    bits = "".join(_encode_g3_1d_row(r) for r in img)
    raw = _pack(bits)
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources << /XObject "
        b"<< /Fax 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length 14 >>\nstream\nBT (t) Tj ET\nendstream\nendobj\n"
        b"5 0 obj\n<< /Type /XObject /Subtype /Image /Width 32 /Height 8"
        b" /ColorSpace /DeviceGray /BitsPerComponent 1"
        b" /Filter /CCITTFaxDecode /DecodeParms << /K 0 /Columns 32"
        b" /Rows 8 >> /Length " + str(len(raw)).encode()
        + b" >>\nstream\n" + raw + b"\nendstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n")
    ims = extract_pdf_images(pdf)
    assert len(ims) == 1
    _, name, arr = ims[0]
    assert name == "Fax" and arr.shape == (8, 32)
    assert np.array_equal(arr == 0, img)


def test_zero_columns_raises_not_loops():
    """/Columns 0 must raise, not loop forever appending empty rows
    (round-4 review)."""
    import pytest

    from vision_parse_spark.functions.ccitt import decode_g3, decode_g4

    with pytest.raises(ValueError):
        decode_g3(b"\x00\x00", columns=0)
    with pytest.raises(ValueError):
        decode_g4(b"\x00\x00", columns=0)
