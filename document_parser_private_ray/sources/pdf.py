"""Minimal deterministic PDF writer + byte-stream text extractor (S2).

The container ships no PDF library (SURVEY §7.0), so ``from_pdf_files``
was a pluggable slot only. This module closes the loop the way SURVEY
§7.0 planned: a tiny GENERATOR writing uncompressed-text PDFs (the
subset: literal-string `Tj` show-text operators, no /Filter streams,
ASCII/latin-1 text, Helvetica fonts) and an EXTRACTOR handling exactly
that subset — so the full chain pdf-bytes -> blocks -> spans -> parse
runs and is testable entirely in-sandbox. Real-world PDFs still route
through the pluggable ``extract=`` hook (pdfplumber/fitz chain,
pdf_parser.py:119-196 shape) when a backend exists.

Block classification reuses the M3 font-heading heuristic
(``functions.layout.is_heading_block`` — pdf_parser.py:215-219), so
the extractor's output is the same typed block stream the reference's
layout integration produces.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List

from ..functions.layout import is_heading_block

HEADING_FONT = ("F2", "Helvetica-Bold", 14)
TEXT_FONT = ("F1", "Helvetica", 10)
# Tables set in the monospace font: the extractor recognizes Courier
# blocks as table grids (rows = lines, cells = tab-separated) — the
# minimal-subset analogue of pdfplumber's line-detection
# (pdf_parser.py:152-162 emits {"page", "data"} per table).
TABLE_FONT = ("F3", "Courier", 9)


def _pdf_escape(s: str) -> str:
    return s.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb_ and pa_ <= pc_:
        return a
    return b if pb_ <= pc_ else c


def _png_predict_encode(data: bytes, columns: int) -> bytes:
    """PNG per-row predictor ENCODER (generator side, 1 byte/pixel):
    rows of ``columns`` bytes, filter byte prepended, cycling through
    all five PNG filter types so a round-trip exercises every decode
    branch. Data is newline-padded to a whole row (trailing whitespace
    is inert in a content stream)."""
    pad = (-len(data)) % columns
    data += b"\n" * pad
    out = bytearray()
    prev = bytes(columns)
    for idx, r in enumerate(range(0, len(data), columns)):
        row = data[r : r + columns]
        ft = idx % 5
        out.append(ft)
        for i in range(columns):
            a = row[i - 1] if i >= 1 else 0
            b = prev[i]
            c = prev[i - 1] if i >= 1 else 0
            pred = (0, a, b, (a + b) >> 1, _paeth(a, b, c))[ft]
            out.append((row[i] - pred) & 0xFF)
        prev = row
    return bytes(out)


def _undo_predictor(
    data: bytes, predictor: int, columns: int, colors: int, bpc: int
) -> bytes:
    """Invert a Flate predictor (PDF 32000-1 §7.4.4.4): TIFF horizontal
    differencing (2) and the PNG per-row filters None/Sub/Up/Average/
    Paeth (10-15). Covers the /DecodeParms the overwhelming majority of
    real-world Flate streams use (reference parity:
    pdf_parser.py:137-166 via pdfplumber); exotic shapes (sub-8-bit
    TIFF components) still raise."""
    if predictor <= 1:
        return data
    bpp = max(1, (colors * bpc + 7) // 8)
    rowlen = (columns * colors * bpc + 7) // 8
    if predictor == 2:
        if bpc != 8:
            raise NotImplementedError(
                "TIFF predictor with BitsPerComponent != 8 is outside the "
                "minimal subset; pass extract= with a full PDF backend"
            )
        out = bytearray(data)
        for r in range(0, len(out) - len(out) % rowlen, rowlen):
            for i in range(r + bpp, r + rowlen):
                out[i] = (out[i] + out[i - bpp]) & 0xFF
        return bytes(out)
    if not 10 <= predictor <= 15:
        raise NotImplementedError(
            f"unknown /Predictor {predictor}; pass extract= with a full PDF backend"
        )
    stride = rowlen + 1
    if len(data) % stride:
        raise ValueError(
            f"PNG-predicted stream length {len(data)} not a multiple of "
            f"row stride {stride}"
        )
    out = bytearray()
    prev = bytearray(rowlen)
    for r in range(0, len(data), stride):
        ft = data[r]
        row = bytearray(data[r + 1 : r + stride])
        if ft == 1:  # Sub
            for i in range(bpp, rowlen):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(rowlen):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(rowlen):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(rowlen):
                a = row[i - bpp] if i >= bpp else 0
                c = prev[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown PNG filter type {ft}")
        out += row
        prev = row
    return bytes(out)


def write_minimal_pdf(
    blocks: List[Dict], compress: bool = False, predictor: int | None = None,
    predictor_columns: int = 64,
) -> bytes:
    """[{"kind": "heading"|"text", "text": str} |
    {"kind": "table", "data": [[cell, ...], ...]}] -> PDF bytes.
    Headings set in Helvetica-Bold 14, body in Helvetica 10 (sizes
    chosen so the M3 heuristic round-trips the kind); table rows set
    in Courier 9 with tab-separated cells (cells must not contain
    tabs/newlines — the minimal subset's table encoding).
    ``compress=True`` Flate-encodes the content stream (the filter
    virtually every real-world PDF uses — pdf_parser.py:137-166
    handles it through pdfplumber; here it's stdlib zlib).
    ``predictor=15`` (with ``compress=True``) additionally runs the
    content stream through the PNG per-row predictor before Flate and
    writes the matching ``/DecodeParms`` — the layout real-world
    writers emit for predictor-compressed streams."""
    content_lines = []
    y = 760
    for b in blocks:
        if b.get("kind") == "table":
            fkey, _, size = TABLE_FONT
            lines = ["\t".join(str(c) for c in row) for row in b.get("data") or []]
        else:
            fkey, _, size = HEADING_FONT if b.get("kind") == "heading" else TEXT_FONT
            lines = (b.get("text") or "").split("\n")
        for ln in lines:
            content_lines.append(
                f"BT /{fkey} {size} Tf 72 {y} Td ({_pdf_escape(ln)}) Tj ET"
            )
            y -= size + 4
            if y < 40:
                y = 760
    stream = "\n".join(content_lines).encode("latin-1", "replace")
    filter_entry = b""
    if compress:
        if predictor is not None:
            if not 10 <= predictor <= 15:
                raise ValueError("generator supports PNG predictors (10-15) only")
            stream = _png_predict_encode(stream, predictor_columns)
        stream = zlib.compress(stream)
        filter_entry = b" /Filter /FlateDecode"
        if predictor is not None:
            filter_entry += (
                f" /DecodeParms << /Predictor {predictor} "
                f"/Columns {predictor_columns} >>".encode()
            )

    objects = []
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objects.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R /F2 6 0 R /F3 7 0 R >> >> /Contents 4 0 R >>"
    )
    objects.append(
        b"<< /Length " + str(len(stream)).encode() + filter_entry
        + b" >>\nstream\n" + stream + b"\nendstream"
    )
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Courier >>")

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    out += f"xref\n0 {len(objects) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode()
    return bytes(out)


_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# the nearest dictionary preceding each `stream` keyword (content-stream
# dicts are flat or one-level-nested: /Length, /Filter, /DecodeParms)
_STREAM_DICT_RE = re.compile(
    rb"<<((?:[^<>]|<<(?:[^<>]|<<[^<>]*>>)*>>)*)>>\s*stream\r?\n", re.DOTALL
)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\s+0\s+R)")
_FLATE_RE = re.compile(rb"/Filter\s*(?:\[\s*)?/FlateDecode")
_PRED_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_FONT_REF_RE = re.compile(rb"/(F\d+)\s+(\d+)\s+0\s+R")
_OBJ_RE = re.compile(rb"(\d+)\s+0\s+obj(.*?)endobj", re.DOTALL)
_BASEFONT_RE = re.compile(rb"/BaseFont\s*/([A-Za-z0-9+-]+)")
_TF_RE = re.compile(rb"/(F\d+)\s+([0-9.]+)\s+Tf")
_TJ_RE = re.compile(rb"\(((?:[^()\\]|\\.)*)\)\s*Tj")
_TOKEN_RE = re.compile(rb"/(F\d+)\s+([0-9.]+)\s+Tf|\(((?:[^()\\]|\\.)*)\)\s*Tj")


def _unescape(raw: bytes) -> str:
    out = []
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt in (b"\\", b"(", b")"):
                out.append(nxt)
                i += 2
                continue
            if nxt == b"n":
                out.append(b"\n")
                i += 2
                continue
        out.append(c)
        i += 1
    return b"".join(out).decode("latin-1")


def _font_map(data: bytes) -> Dict[bytes, str]:
    """Resolve /Fx resource keys to BaseFont names through the object
    table (the minimal-subset version of a font-descriptor walk)."""
    obj_bodies = {num: body for num, body in _OBJ_RE.findall(data)}
    mapping: Dict[bytes, str] = {}
    for fkey, objnum in _FONT_REF_RE.findall(data):
        body = obj_bodies.get(objnum, b"")
        m = _BASEFONT_RE.search(body)
        if m:
            mapping[fkey] = m.group(1).decode("latin-1")
    return mapping


def _content_streams(data: bytes) -> List[bytes]:
    """Decoded content-stream payloads. ``/Length <n>`` (direct, not an
    indirect ``n 0 R`` reference) slices the payload exactly — Flate
    output may legally contain ``endstream`` as bytes; otherwise fall
    back to the lazy endstream scan. FlateDecode inflates via stdlib
    zlib, then any ``/DecodeParms`` predictor (TIFF differencing, PNG
    Sub/Up/Average/Paeth) is inverted; any other filter is outside the
    minimal subset and raises."""
    streams: List[bytes] = []
    for m in _STREAM_DICT_RE.finditer(data):
        d = m.group(1)
        start = m.end()
        lm = _LENGTH_RE.search(d)
        if lm:
            payload = data[start : start + int(lm.group(1))]
        else:
            end = data.find(b"endstream", start)
            if end < 0:
                continue
            payload = data[start:end]
            if payload.endswith(b"\n"):
                payload = payload[:-1]
            if payload.endswith(b"\r"):
                payload = payload[:-1]
        if _FLATE_RE.search(d):
            payload = zlib.decompress(payload)
            if b"/DecodeParms" in d:
                payload = _undo_predictor(
                    payload,
                    int(mm.group(1)) if (mm := _PRED_RE.search(d)) else 1,
                    int(mm.group(1)) if (mm := _COLS_RE.search(d)) else 1,
                    int(mm.group(1)) if (mm := _COLORS_RE.search(d)) else 1,
                    int(mm.group(1)) if (mm := _BPC_RE.search(d)) else 8,
                )
        elif b"/Filter" in d:
            raise NotImplementedError(
                "only FlateDecode content streams are inside the minimal "
                "subset; pass extract= with a full PDF backend"
            )
        streams.append(payload)
    return streams


def extract_pdf_blocks(data: bytes) -> List[Dict]:
    """PDF bytes (minimal subset) -> [{"kind", "text"}] blocks.

    Consecutive show-text lines in the same font+size merge into one
    block (the analogue of a fitz text block); each block classifies
    via the M3 heading heuristic on its font name/size."""
    if not data.startswith(b"%PDF"):
        raise ValueError("not a PDF byte stream")
    fonts = _font_map(data)
    lines: List[tuple] = []  # (font_name, size, text)
    cur_font, cur_size = "", 10.0
    for stream in _content_streams(data):
        for m in _TOKEN_RE.finditer(stream):
            if m.group(1) is not None:
                cur_font = fonts.get(m.group(1), m.group(1).decode("latin-1"))
                cur_size = float(m.group(2))
            else:
                lines.append((cur_font, cur_size, _unescape(m.group(3))))
    blocks: List[Dict] = []
    for font, size, text in lines:
        if blocks and blocks[-1]["_font"] == (font, size):
            blocks[-1]["text"] += "\n" + text
        else:
            blocks.append({"text": text, "_font": (font, size)})
    import json

    out = []
    for b in blocks:
        font, size = b.pop("_font")
        if font.startswith("Courier"):
            # table grid: rows = lines, cells = tab-separated. The block
            # carries the reference's table shape ({"page", "data"},
            # pdf_parser.py:158-161) and the span text is the same JSON
            # encoding layout_to_spans uses for table spans.
            data = [ln.split("\t") for ln in b["text"].split("\n")]
            out.append(
                {
                    "kind": "table", "text": json.dumps(data), "data": data,
                    "page": 0, "font": font, "size": size,
                }
            )
            continue
        kind = "heading" if is_heading_block(b["text"], font, size) else "text"
        out.append({"kind": kind, "text": b["text"], "font": font, "size": size})
    return out
