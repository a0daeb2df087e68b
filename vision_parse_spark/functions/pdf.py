"""Pure-Python PDF text-layer extraction (T2's text channel).

The reference renders each PDF page and reads it back with a vision
model (``/root/reference/src/vision_parse/parser.py:116-131,152-165``).
Raster/vision libs are out of scope here, but the TEXT LAYER of a PDF
is pure structure: objects, FlateDecode streams (zlib is stdlib), and
content-stream text operators.  This module implements that layer from
the PDF 1.7 spec so ``%PDF-`` payloads are genuinely parsed instead of
header-stripped:

* object scan — every ``N G obj … endobj``, stream payloads split at
  ``stream``/``endstream``;
* page tree walk — trailer ``/Root`` -> ``/Pages`` -> ``/Kids``
  (recursive, preserves document page order), falling back to
  ``/Type /Page`` objects in file order when the trailer is damaged;
* stream decode — ``/FlateDecode`` via zlib, raw otherwise;
* content-stream interpreter — ``BT``/``ET`` blocks; ``Tj``, ``TJ``
  (negative kerns wider than half an em emit a space), ``'`` and ``"``
  (newline + show); ``Td``/``TD``/``T*``/``Tm`` line breaks; literal
  strings with ``\\``-escapes and octal, hex strings, UTF-16BE BOM
  detection.

Per-document Python cost only (one parse per pdf payload, inside an
Arrow batch) — the same per-entity cost class as the reference's
per-page render loop; plain-text rows never enter this code.
"""

from __future__ import annotations

import re
import zlib

import pandas as pd

_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b(.*?)endobj", re.S)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_TRAILER_ROOT_RE = re.compile(rb"/Root\s+(\d+)\s+\d+\s+R")
_PAGES_REF_RE = re.compile(rb"/Pages\s+(\d+)\s+\d+\s+R")
_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.S)
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
_CONTENTS_ONE_RE = re.compile(rb"/Contents\s+(\d+)\s+\d+\s+R")
_CONTENTS_ARR_RE = re.compile(rb"/Contents\s*\[(.*?)\]", re.S)
_TYPE_PAGE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TYPE_PAGES_RE = re.compile(rb"/Type\s*/Pages\b")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode\b")

# TJ kern threshold: text-space units/1000; anything wider than half an
# em reads as a word gap (pdfminer uses a comparable heuristic).
_TJ_SPACE_KERN = -500.0

_ESCAPES = {
    ord("n"): "\n", ord("r"): "\r", ord("t"): "\t",
    ord("b"): "\b", ord("f"): "\f",
    ord("("): "(", ord(")"): ")", ord("\\"): "\\",
}


class PdfParseError(ValueError):
    """Raised when bytes claim to be a PDF but carry no parseable
    object structure (callers fall back to treating the payload as a
    header-stripped text blob)."""


def _scan_objects(data: bytes) -> dict[int, bytes]:
    return {int(m.group(1)): m.group(3) for m in _OBJ_RE.finditer(data)}


def _decode_stream(body: bytes) -> bytes:
    m = _STREAM_RE.search(body)
    if not m:
        return b""
    raw = m.group(1)
    if _FLATE_RE.search(body[: m.start(1)]):
        try:
            return zlib.decompress(raw)
        except zlib.error:
            # tolerate a trailing EOL captured before `endstream`
            return zlib.decompress(raw.rstrip(b"\r\n"))
    return raw


def _page_order(objs: dict[int, bytes], data: bytes) -> list[int]:
    """Page object numbers in document order via the /Root -> /Pages ->
    /Kids tree; file-order /Type /Page fallback."""
    root_num = None
    m = _TRAILER_ROOT_RE.search(data)
    if m:
        root_num = int(m.group(1))
    pages_num = None
    if root_num is not None and root_num in objs:
        pm = _PAGES_REF_RE.search(objs[root_num])
        if pm:
            pages_num = int(pm.group(1))
    order: list[int] = []

    def walk(num: int, depth: int = 0) -> None:
        if depth > 32 or num not in objs:
            return
        body = objs[num]
        if _TYPE_PAGES_RE.search(body):
            km = _KIDS_RE.search(body)
            if km:
                for r in _REF_RE.finditer(km.group(1)):
                    walk(int(r.group(1)), depth + 1)
        elif _TYPE_PAGE_RE.search(body):
            order.append(num)

    if pages_num is not None:
        walk(pages_num)
    if not order:  # damaged/missing trailer: file order
        order = [n for n, b in objs.items() if _TYPE_PAGE_RE.search(b)]
    return order


def _page_content(objs: dict[int, bytes], page_num: int) -> bytes:
    body = objs[page_num]
    refs: list[int] = []
    am = _CONTENTS_ARR_RE.search(body)
    if am:
        refs = [int(r.group(1)) for r in _REF_RE.finditer(am.group(1))]
    else:
        om = _CONTENTS_ONE_RE.search(body)
        if om:
            refs = [int(om.group(1))]
    return b"\n".join(_decode_stream(objs[r]) for r in refs if r in objs)


def _decode_pdf_string(raw: bytes) -> str:
    if raw.startswith(b"\xfe\xff"):
        return raw[2:].decode("utf-16-be", errors="replace")
    return raw.decode("latin-1")


def _tokenize(content: bytes):
    """Yield ('str', bytes) | ('num', float) | ('op', bytes) |
    ('[',) | (']',) tokens from a content stream."""
    i, n = 0, len(content)
    while i < n:
        c = content[i]
        if c in b" \t\r\n\x00\f":
            i += 1
        elif c == 0x25:  # '%' comment to EOL
            j = content.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # '(' literal string
            buf = bytearray()
            depth = 1
            i += 1
            while i < n and depth:
                b = content[i]
                if b == 0x5C and i + 1 < n:  # backslash
                    nxt = content[i + 1]
                    if nxt in _ESCAPES:
                        buf.extend(_ESCAPES[nxt].encode("latin-1"))
                        i += 2
                    elif 0x30 <= nxt <= 0x37:  # octal \ddd (1-3 digits)
                        j = i + 1
                        oct_digits = bytearray()
                        while j < n and len(oct_digits) < 3 and 0x30 <= content[j] <= 0x37:
                            oct_digits.append(content[j])
                            j += 1
                        buf.append(int(oct_digits.decode(), 8) & 0xFF)
                        i = j
                    elif nxt in (0x0A, 0x0D):  # line continuation
                        i += 2
                        if nxt == 0x0D and i < n and content[i] == 0x0A:
                            i += 1
                    else:
                        buf.append(nxt)
                        i += 2
                elif b == 0x28:
                    depth += 1
                    buf.append(b)
                    i += 1
                elif b == 0x29:
                    depth -= 1
                    if depth:
                        buf.append(b)
                    i += 1
                else:
                    buf.append(b)
                    i += 1
            yield ("str", bytes(buf))
        elif c == 0x3C:  # '<'
            if i + 1 < n and content[i + 1] == 0x3C:  # dict '<<'
                yield ("op", b"<<")
                i += 2
            else:  # hex string
                j = content.find(b">", i)
                j = n if j < 0 else j
                hx = re.sub(rb"\s", b"", content[i + 1 : j])
                if len(hx) % 2:
                    hx += b"0"
                yield ("str", bytes.fromhex(hx.decode("latin-1")))
                i = j + 1
        elif c == 0x3E and i + 1 < n and content[i + 1] == 0x3E:
            yield ("op", b">>")
            i += 2
        elif c == 0x5B:
            yield ("[",)
            i += 1
        elif c == 0x5D:
            yield ("]",)
            i += 1
        elif c == 0x2F:  # name
            m = re.match(rb"/[^\s()<>\[\]{}/%]*", content[i:])
            yield ("op", m.group(0))
            i += m.end()
        else:
            m = re.match(rb"[+-]?(?:\d+\.?\d*|\.\d+)", content[i:])
            if m:
                yield ("num", float(m.group(0)))
                i += m.end()
            else:
                m = re.match(rb"[^\s()<>\[\]{}/%]+", content[i:])
                if m:
                    yield ("op", m.group(0))
                    i += m.end()
                else:  # unmatchable byte — skip
                    i += 1


def _content_text(content: bytes) -> str:
    """Interpret one page's content stream into text lines."""
    lines: list[str] = []
    cur: list[str] = []
    in_text = False
    in_array: list | None = None
    stack: list = []  # operand stack (numbers/strings)

    def flush_line() -> None:
        if cur:
            lines.append("".join(cur).rstrip())
            cur.clear()

    for tok in _tokenize(content):
        kind = tok[0]
        if kind == "[":
            in_array = []
        elif kind == "]":
            stack.append(in_array if in_array is not None else [])
            in_array = None
        elif kind in ("str", "num"):
            (in_array if in_array is not None else stack).append(tok)
        else:
            op = tok[1]
            if op == b"BT":
                in_text = True
            elif op == b"ET":
                flush_line()
                in_text = False
            elif in_text and op == b"Tj":
                if stack and stack[-1][0] == "str":
                    cur.append(_decode_pdf_string(stack[-1][1]))
            elif in_text and op == b"TJ":
                if stack and isinstance(stack[-1], list):
                    for el in stack[-1]:
                        if el[0] == "str":
                            cur.append(_decode_pdf_string(el[1]))
                        elif el[0] == "num" and el[1] <= _TJ_SPACE_KERN:
                            if cur and not cur[-1].endswith(" "):
                                cur.append(" ")
            elif in_text and op == b"'":
                flush_line()
                if stack and stack[-1][0] == "str":
                    cur.append(_decode_pdf_string(stack[-1][1]))
            elif in_text and op == b'"':
                flush_line()
                if stack and stack[-1][0] == "str":
                    cur.append(_decode_pdf_string(stack[-1][1]))
            elif in_text and op in (b"Td", b"TD", b"T*", b"Tm"):
                # a text-position op after shown text starts a new line
                # (Tm/Td-per-line is how virtually all generators emit)
                flush_line()
            stack.clear()
    flush_line()
    # in-string \n escapes also break lines
    out = "\n".join(lines)
    return "\n".join(seg.rstrip() for seg in out.split("\n")).strip("\n")


def extract_pdf_pages(data: bytes) -> list[str]:
    """Text of each page, in document page order."""
    if not data.startswith(b"%PDF-"):
        raise PdfParseError("missing %PDF- header")
    objs = _scan_objects(data)
    if not objs:
        raise PdfParseError("no objects")
    order = _page_order(objs, data)
    if not order:
        raise PdfParseError("no pages")
    return [_content_text(_page_content(objs, p)) for p in order]


def extract_pdf_text(data: bytes, page_sep: str = "\n\n") -> str:
    """All page texts joined (reference joins per-page markdown with
    blank lines, parser.py:195-199)."""
    return page_sep.join(extract_pdf_pages(data))


def extract_pdf_text_series(texts: pd.Series, page_sep: str = "\n\n"
                            ) -> tuple[pd.Series, pd.Series]:
    """Batch wrapper for %PDF- payloads stored as latin-1 strings.

    Returns (extracted_text, parse_ok).  Rows that fail structural
    parsing fall back to the header-strip treatment (legacy pdf_text
    payloads that are really text blobs with a %PDF- first line)."""
    out = []
    ok = []
    for s in texts.fillna(""):
        try:
            out.append(extract_pdf_text(
                s.encode("latin-1", errors="replace"), page_sep))
            ok.append(True)
        except (PdfParseError, zlib.error, ValueError):
            out.append(re.sub(r"^%PDF-[^\n]*\n?", "", s))
            ok.append(False)
    return (pd.Series(out, index=texts.index, dtype="object"),
            pd.Series(ok, index=texts.index, dtype=bool))


# ---------------------------------------------------------------------------
# mini-PDF writer — genuine PDF 1.4 bytes (xref table, FlateDecode
# content streams) for the synth generator and tests.  Output parses
# with any conformant reader, not just this module.
# ---------------------------------------------------------------------------


def _esc(s: str) -> bytes:
    return (
        s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
        .encode("latin-1", errors="replace")
    )


def make_pdf_bytes(pages: list[list[str]], compress: bool = True) -> bytes:
    """Build a real multi-page PDF: one content stream per page, one
    line per list entry, Helvetica 12pt, 14pt leading."""
    n_pages = len(pages)
    objects: list[bytes] = []  # bodies, object number = index + 1
    font_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")                # 1
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode())  # 2
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objects.append(
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
            f"/Contents {content_num} 0 R >>".encode())
        ops = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(lines):
            if j:
                ops.append(b"0 -14 Td")
            ops.append(b"(" + _esc(line) + b") Tj")
        ops.append(b"ET")
        stream = b" ".join(ops)
        if compress:
            stream = zlib.compress(stream)
            head = (f"<< /Length {len(stream)} /Filter /FlateDecode >>"
                    .encode())
        else:
            head = f"<< /Length {len(stream)} >>".encode()
        objects.append(head + b"\nstream\n" + stream + b"\nendstream")
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")  # font

    buf = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode()
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode()
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n".encode())
    return bytes(buf)
