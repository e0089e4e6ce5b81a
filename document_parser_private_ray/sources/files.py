"""Raw-file sources: bytes -> interleaved spans (S1 raw-file mode +
M12 validation, SURVEY §2.1/§2.2).

``from_text_files`` is the text-mode byte-stream extractor: reads files
with ``read_binary_files`` and turns each into a spans row via the M1
heading/block splitter — the same structure TextParser.parse produces
(text_parser.py:17-39), with per-row error capture replacing the
reference's validate-or-raise (file_utils.py:4-11): an unreadable /
undecodable file degrades to an ``error`` row, never a task failure.

``from_pdf_files`` is the PDF slot: the container has no PDF libraries
(SURVEY §7.0), so the decode hook is pluggable exactly like the media
decoder — pass ``extract=callable(bytes) -> list[block]`` (e.g. a
pdfplumber 4-stage chain, pdf_parser.py:119-196 shape) when available;
the default raises per-row NotImplementedError captured in ``error``.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import pyarrow as pa

from ..functions.headings import split_blocks
from ..schemas import SPAN_TYPE

_FILE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_TYPE)),
        ("file_name", pa.string()),
        ("file_size", pa.int64()),
        ("format", pa.string()),
        ("error", pa.string()),
    ]
)


def _blocks_to_spans(blocks: List[dict]) -> List[dict]:
    return [
        {"kind": b["kind"], "text": b["text"], "media_ref": "", "offset": i}
        for i, b in enumerate(blocks)
    ]


def _decode_text_batch(batch: "pa.Table") -> pa.Table:
    rows = []
    for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
        import os

        row = {
            "doc_id": path,
            "spans": [],
            "file_name": os.path.basename(path),
            "file_size": len(data) if data is not None else 0,
            "format": "text",
            "error": "",
        }
        try:
            raw_text = (data or b"").decode("utf-8")
            row["spans"] = _blocks_to_spans(split_blocks(raw_text))
        except Exception as e:
            row["error"] = f"{type(e).__name__}: {e}"
        rows.append(row)
    return pa.Table.from_pylist(rows, schema=_FILE_SCHEMA)


def from_text_files(paths):
    """Directory/list of text files -> spans Dataset (doc_id = path)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(_decode_text_batch, batch_format="pyarrow", batch_size=64)


class PdfExtract:
    """PDF byte-stream extractor stage (S2-S5).

    ``extract(data: bytes) -> list[{"kind","text"}]`` mirrors the
    reference's staged fallback chain output; the layout analyzer /
    OCR / Marker models would live in this actor's __init__. The
    DEFAULT backend is the in-repo minimal-subset extractor
    (``sources.pdf.extract_pdf_blocks``: uncompressed literal-string
    streams, M3 font-heading classification); a full backend
    (pdfplumber/fitz chain, pdf_parser.py:119-196 shape) plugs in via
    ``extract=`` — compressed/real-world PDFs degrade to error rows
    until one is provided."""

    def __init__(self, extract: Optional[Callable] = None):
        if extract is None:
            from .pdf import extract_pdf_blocks

            extract = extract_pdf_blocks
        self.extract = extract

    def __call__(self, batch: pa.Table) -> pa.Table:
        import os

        rows = []
        for path, data in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            row = {
                "doc_id": path,
                "spans": [],
                "file_name": os.path.basename(path),
                "file_size": len(data) if data is not None else 0,
                "format": "pdf",
                "error": "",
            }
            try:
                row["spans"] = _blocks_to_spans(self.extract(data))
            except Exception as e:
                row["error"] = f"{type(e).__name__}: {e}"
            rows.append(row)
        return pa.Table.from_pylist(rows, schema=_FILE_SCHEMA)


def from_pdf_files(paths, extract: Optional[Callable] = None, concurrency=(1, 4)):
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)
    return ds.map_batches(
        PdfExtract,
        fn_constructor_kwargs={"extract": extract},
        batch_format="pyarrow",
        batch_size=16,
        concurrency=concurrency,
    )
