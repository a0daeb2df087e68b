"""CCITT Group 4 (ITU-T T.6, pure 2D MMR) fax decoder — stdlib+numpy.

Scanned-document PDFs store their page images as /CCITTFaxDecode
streams with ``/K -1`` (the reference's own fixture
``tests/Texas-Holdem-Rules.pdf`` is exactly this: one G4-compressed
page bitmap drawn via ``/FXX1 Do``).  The reference hands such pages
to its vision model (``parser.py:116-131``); here decoding the bitmap
lets the SAME CV region pipeline and media sink run on scanned pages.

Decoder structure (T.6 §2):
* per row, the coder emits modes against the previous (reference)
  row's changing elements: Pass (0001), Horizontal (001 + two T.4
  run-length codes), Vertical V0/VR1-3/VL1-3;
* rows are run-length structured — the decoder walks changing-element
  lists, so cost is O(transitions), not O(pixels);
* every row must land EXACTLY on /Columns; any table or mode error
  desyncs immediately, which makes decode-to-completion of a
  multi-thousand-row image a strong structural self-check.

K<0 (pure G4) and — since round 4 — G3 (``decode_g3``: K=0 pure 1-D
Modified Huffman, K>0 mixed 1-D/2-D with EOL tag bits, RTC detection)
are implemented; /EncodedByteAlign raises ``NotImplementedError``.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# T.4 run-length code tables (terminating 0-63, makeup 64+, shared
# extended makeups 1792-2560).  (code_bits_string, run_length)
# ---------------------------------------------------------------------------

_WHITE_CODES = {
    "00110101": 0, "000111": 1, "0111": 2, "1000": 3, "1011": 4,
    "1100": 5, "1110": 6, "1111": 7, "10011": 8, "10100": 9,
    "00111": 10, "01000": 11, "001000": 12, "000011": 13, "110100": 14,
    "110101": 15, "101010": 16, "101011": 17, "0100111": 18,
    "0001100": 19, "0001000": 20, "0010111": 21, "0000011": 22,
    "0000100": 23, "0101000": 24, "0101011": 25, "0010011": 26,
    "0100100": 27, "0011000": 28, "00000010": 29, "00000011": 30,
    "00011010": 31, "00011011": 32, "00010010": 33, "00010011": 34,
    "00010100": 35, "00010101": 36, "00010110": 37, "00010111": 38,
    "00101000": 39, "00101001": 40, "00101010": 41, "00101011": 42,
    "00101100": 43, "00101101": 44, "00000100": 45, "00000101": 46,
    "00001010": 47, "00001011": 48, "01010010": 49, "01010011": 50,
    "01010100": 51, "01010101": 52, "00100100": 53, "00100101": 54,
    "01011000": 55, "01011001": 56, "01011010": 57, "01011011": 58,
    "01001010": 59, "01001011": 60, "00110010": 61, "00110011": 62,
    "00110100": 63,
    # makeup
    "11011": 64, "10010": 128, "010111": 192, "0110111": 256,
    "00110110": 320, "00110111": 384, "01100100": 448, "01100101": 512,
    "01101000": 576, "01100111": 640, "011001100": 704,
    "011001101": 768, "011010010": 832, "011010011": 896,
    "011010100": 960, "011010101": 1024, "011010110": 1088,
    "011010111": 1152, "011011000": 1216, "011011001": 1280,
    "011011010": 1344, "011011011": 1408, "010011000": 1472,
    "010011001": 1536, "010011010": 1600, "011000": 1664,
    "010011011": 1728,
}

_BLACK_CODES = {
    "0000110111": 0, "010": 1, "11": 2, "10": 3, "011": 4, "0011": 5,
    "0010": 6, "00011": 7, "000101": 8, "000100": 9, "0000100": 10,
    "0000101": 11, "0000111": 12, "00000100": 13, "00000111": 14,
    "000011000": 15, "0000010111": 16, "0000011000": 17,
    "0000001000": 18, "00001100111": 19, "00001101000": 20,
    "00001101100": 21, "00000110111": 22, "00000101000": 23,
    "00000010111": 24, "00000011000": 25, "000011001010": 26,
    "000011001011": 27, "000011001100": 28, "000011001101": 29,
    "000001101000": 30, "000001101001": 31, "000001101010": 32,
    "000001101011": 33, "000011010010": 34, "000011010011": 35,
    "000011010100": 36, "000011010101": 37, "000011010110": 38,
    "000011010111": 39, "000001101100": 40, "000001101101": 41,
    "000011011010": 42, "000011011011": 43, "000001010100": 44,
    "000001010101": 45, "000001010110": 46, "000001010111": 47,
    "000001100100": 48, "000001100101": 49, "000001010010": 50,
    "000001010011": 51, "000000100100": 52, "000000110111": 53,
    "000000111000": 54, "000000100111": 55, "000000101000": 56,
    "000001011000": 57, "000001011001": 58, "000000101011": 59,
    "000000101100": 60, "000001011010": 61, "000001100110": 62,
    "000001100111": 63,
    # makeup
    "0000001111": 64, "000011001000": 128, "000011001001": 192,
    "000001011011": 256, "000000110011": 320, "000000110100": 384,
    "000000110101": 448, "0000001101100": 512, "0000001101101": 576,
    "0000001001010": 640, "0000001001011": 704, "0000001001100": 768,
    "0000001001101": 832, "0000001110010": 896, "0000001110011": 960,
    "0000001110100": 1024, "0000001110101": 1088, "0000001110110": 1152,
    "0000001110111": 1216, "0000001010010": 1280, "0000001010011": 1344,
    "0000001010100": 1408, "0000001010101": 1472, "0000001011010": 1536,
    "0000001011011": 1600, "0000001100100": 1664, "0000001100101": 1728,
}

_EXT_MAKEUP = {
    "00000001000": 1792, "00000001100": 1856, "00000001101": 1920,
    "000000010010": 1984, "000000010011": 2048, "000000010100": 2112,
    "000000010101": 2176, "000000010110": 2240, "000000010111": 2304,
    "000000011100": 2368, "000000011101": 2432, "000000011110": 2496,
    "000000011111": 2560,
}


def _lut(codes: dict[str, int]) -> dict[tuple[int, int], int]:
    out = {(len(k), int(k, 2)): v for k, v in codes.items()}
    out.update({(len(k), int(k, 2)): v for k, v in _EXT_MAKEUP.items()})
    return out


_WHITE_LUT = _lut(_WHITE_CODES)
_BLACK_LUT = _lut(_BLACK_CODES)


class _Bits:
    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position
        self.n = len(data) * 8

    def bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ValueError("CCITT: bitstream exhausted")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def peek_is(self, pattern: str) -> bool:
        p = self.pos
        if p + len(pattern) > self.n:
            return False
        for i, ch in enumerate(pattern):
            if ((self.data[(p + i) >> 3] >> (7 - ((p + i) & 7))) & 1) \
                    != (ch == "1"):
                return False
        return True


def _read_run(bits: _Bits, white: bool) -> int:
    """Total run length: zero or more makeup codes then a terminator."""
    lut = _WHITE_LUT if white else _BLACK_LUT
    total = 0
    while True:
        code = 0
        length = 0
        run = None
        while length < 14:
            code = (code << 1) | bits.bit()
            length += 1
            run = lut.get((length, code))
            if run is not None:
                break
        if run is None:
            raise ValueError("CCITT: bad run code")
        total += run
        if run < 64:  # terminating code ends the run
            return total


_EOFB = "000000000001000000000001"


def _decode_2d_row(bits: _Bits, ref: list[int],
                   columns: int) -> list[int]:
    """One 2-D (MR/MMR) coded row against the reference row's changing
    elements; returns the row's change positions (shared by G4 and the
    2-D rows of mixed G3)."""
    cur: list[int] = []
    a0 = -1
    color = 0  # 0 white, 1 black
    while a0 < columns:
        idx = 0
        while idx < len(ref) and (ref[idx] <= a0 or (idx & 1) != color):
            idx += 1
        b1 = ref[idx] if idx < len(ref) else columns
        b2 = ref[idx + 1] if idx + 1 < len(ref) else columns
        if bits.peek_is("0001"):  # pass
            bits.pos += 4
            a0 = b2
        elif bits.peek_is("001"):  # horizontal
            bits.pos += 3
            start = max(a0, 0)
            r1 = _read_run(bits, color == 0)
            r2 = _read_run(bits, color != 0)
            cur.append(min(start + r1, columns))
            cur.append(min(start + r1 + r2, columns))
            a0 = start + r1 + r2
        else:  # vertical modes
            if bits.peek_is("1"):
                d, w = 0, 1
            elif bits.peek_is("011"):
                d, w = 1, 3
            elif bits.peek_is("010"):
                d, w = -1, 3
            elif bits.peek_is("000011"):
                d, w = 2, 6
            elif bits.peek_is("000010"):
                d, w = -2, 6
            elif bits.peek_is("0000011"):
                d, w = 3, 7
            elif bits.peek_is("0000010"):
                d, w = -3, 7
            else:
                raise ValueError(
                    f"CCITT: bad mode code at bit {bits.pos}")
            bits.pos += w
            a1 = b1 + d
            if a1 < 0 or a1 > columns:
                raise ValueError("CCITT: vertical move out of row")
            cur.append(a1)
            a0 = a1
            color ^= 1
    return cur


def _row_from_changes(cur: list[int], columns: int) -> np.ndarray:
    row = np.zeros(columns, dtype=bool)
    pos = 0
    col = False
    for c in cur:
        c = min(c, columns)
        if col:
            row[pos:c] = True
        pos = c
        col = not col
    if col and pos < columns:
        row[pos:] = True
    return row


def _row_changes(row: np.ndarray) -> list[int]:
    flips = np.flatnonzero(np.diff(
        np.concatenate([[False], row]).astype(np.int8)) != 0)
    return flips.tolist()


def decode_g4(data: bytes, columns: int, rows: int | None = None,
              black_is_1: bool = False) -> np.ndarray:
    """Decode a pure-G4 (/K < 0) stream to an HxW uint8 GRAY image.

    Bit sense follows the PDF filter contract literally: the filter
    emits bit 1 for coding-black when ``black_is_1`` (else bit 0), and
    DeviceGray renders bit 1 as WHITE (Decode [0 1]).  So with
    ``black_is_1=True`` coding-black pixels come out white — the
    double inversion real producers rely on (the reference's own
    Texas-Holdem fixture: 95% of pixels are coding-black, i.e. the
    page background).  A /Decode [1 0] array flips once more —
    callers handle that."""
    if columns < 1:
        raise ValueError(f"CCITT: columns must be >= 1, got {columns}")
    bits = _Bits(data)
    # reference line: changing-element positions, alternating colors
    # starting white; an all-white line has no changes
    ref: list[int] = []
    out_rows: list[np.ndarray] = []
    while True:
        if rows is not None and len(out_rows) >= rows:
            break
        if bits.pos >= bits.n or bits.peek_is(_EOFB):
            break
        cur = _decode_2d_row(bits, ref, columns)
        row = _row_from_changes(cur, columns)
        out_rows.append(row)
        ref = _row_changes(row)
    if rows is not None and len(out_rows) != rows:
        raise ValueError(
            f"CCITT: decoded {len(out_rows)} rows, expected {rows}")
    coding_black = np.array(out_rows, dtype=bool).reshape(-1, columns)
    bit = coding_black if black_is_1 else ~coding_black
    return np.where(bit, np.uint8(255), np.uint8(0))


def _try_eol(bits: _Bits) -> bool:
    """Consume one EOL (>= 11 zeros then a 1 — fill bits tolerated,
    T.4 §4.1.2); False (position restored) when absent."""
    save = bits.pos
    zeros = 0
    while bits.pos < bits.n and zeros <= 64:
        if bits.bit():
            if zeros >= 11:
                return True
            bits.pos = save
            return False
        zeros += 1
    bits.pos = save
    return False


def _decode_1d_row(bits: _Bits, columns: int) -> np.ndarray:
    """One MH (T.4 1-D) row: alternating white/black total runs from
    column 0; must land exactly on `columns`."""
    row = np.zeros(columns, dtype=bool)
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(bits, white)
        end = pos + run
        if end > columns:
            raise ValueError("CCITT: 1-D run past row end")
        if not white:
            row[pos:end] = True
        pos = end
        white = not white
    return row


def decode_g3(data: bytes, columns: int, rows: int | None = None,
              k: int = 0, black_is_1: bool = False,
              byte_align: bool = False) -> np.ndarray:
    """Decode a G3 (/K >= 0) CCITT stream to an HxW uint8 GRAY image.

    K = 0: pure 1-D Modified Huffman rows, optional EOLs between them.
    K > 0: mixed mode — when a row follows an EOL, a tag bit selects
    1-D (1) or 2-D (0) coding for it (T.4 §4.2.1); 2-D rows reuse the
    G4 mode decoder against the previous row.  Six consecutive EOLs
    (RTC) end the image.  Same double-inversion bit-sense contract as
    ``decode_g4``."""
    if byte_align:
        raise NotImplementedError("/EncodedByteAlign G3")
    if columns < 1:
        # a zero-width 1-D row consumes no bits — without this guard a
        # crafted /Columns 0 stream loops forever appending empty rows
        raise ValueError(f"CCITT: columns must be >= 1, got {columns}")
    bits = _Bits(data)
    out_rows: list[np.ndarray] = []
    ref: list[int] = []
    while True:
        if rows is not None and len(out_rows) >= rows:
            break
        if bits.pos >= bits.n:
            break
        # EOL(+tag) units: in K>0 every EOL is followed by a tag bit
        # (1 = 1-D, 0 = 2-D), including inside the RTC sequence
        two_d = False
        if _try_eol(bits):
            eols = 1
            while True:
                if k > 0:
                    if bits.pos >= bits.n:
                        break
                    two_d = bits.bit() == 0
                if _try_eol(bits):
                    eols += 1
                    continue
                break
            if eols >= 6 or bits.pos >= bits.n:
                break  # RTC / trailing EOLs
        if bits.pos >= bits.n:
            break
        if two_d:
            cur = _decode_2d_row(bits, ref, columns)
            row = _row_from_changes(cur, columns)
        else:
            row = _decode_1d_row(bits, columns)
        out_rows.append(row)
        ref = _row_changes(row)
    if rows is not None and len(out_rows) != rows:
        raise ValueError(
            f"CCITT: decoded {len(out_rows)} rows, expected {rows}")
    if not out_rows:
        raise ValueError("CCITT: empty G3 stream")
    coding_black = np.array(out_rows, dtype=bool).reshape(-1, columns)
    bit = coding_black if black_is_1 else ~coding_black
    return np.where(bit, np.uint8(255), np.uint8(0))
