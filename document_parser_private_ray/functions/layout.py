"""Layout analysis (M2) + layout integration / font-heading heuristic
(M3) — pure logic over layout dictionaries.

Mirrors the reference's ``LayoutAnalyzer``
(layout_analyzer.py:9-155) and ``PDFParser._integrate_layout``
(pdf_parser.py:201-239) with the PDF library factored OUT: the input is
the page dictionary the pdf backend would produce (the exact
``fitz.Page.get_text("dict")`` shape), so everything here is testable
on plain dicts — which is how the reference's own
``test_LayoutAnalyzer.py`` tests it (mocked fitz page dicts).

API-shape note: the reference's tests and its implementation disagree
about the analyzer's output keys (tests read ``layout["pages"]`` /
``block["bbox"]`` / ``block["font_summary"]``; the implementation
emits ``text_blocks`` / ``position.bbox`` / ``font`` and the
integration at pdf_parser.py:208-216 consumes the latter). This module
emits the UNION of both shapes so the integration contract and the
tested contract both hold; value semantics follow the implementation
(e.g. per-font char counts use the stripped span text,
layout_analyzer.py:72-97).
"""

from __future__ import annotations

from typing import Dict, List, Optional

DEFAULT_FONT_SIZE = 10.0


def process_text_block(block: Dict) -> Dict:
    """One text block -> text + per-font char counts + dominant font
    (layout_analyzer.py:61-134)."""
    block_text = ""
    font_details: Dict[str, Dict] = {}

    try:
        for line in block.get("lines", []):
            for span in line.get("spans", []):
                text = span.get("text", "").strip()
                if not text:
                    continue
                block_text += text + " "

                font = span.get("font", "")
                if isinstance(font, str):
                    font_name = font
                elif isinstance(font, dict):
                    font_name = font.get("name", "Unknown")
                else:
                    font_name = "Unknown"

                size = span.get("size", None)
                if size is None:
                    size = span.get("font_size", span.get("fontSize", DEFAULT_FONT_SIZE))
                try:
                    font_size = float(size)
                except (TypeError, ValueError):
                    font_size = DEFAULT_FONT_SIZE

                font_key = f"{font_name}_{font_size}"
                font_details[font_key] = {
                    "name": font_name,
                    "size": font_size,
                    "count": font_details.get(font_key, {}).get("count", 0) + len(text),
                }
            block_text += "\n"
    except Exception:
        return {
            "text": block_text.strip() or block.get("text", ""),
            "bbox": block.get("bbox", [0, 0, 0, 0]),
            "position": {"bbox": block.get("bbox", [0, 0, 0, 0]), "page": block.get("page", 0)},
            "font": {"name": "Unknown", "size": DEFAULT_FONT_SIZE},
            "font_summary": {},
            "fonts": [],
        }

    font_summary = summarize_fonts(font_details)
    return {
        "text": block_text.strip(),
        "bbox": block.get("bbox", [0, 0, 0, 0]),
        "position": {"bbox": block.get("bbox", [0, 0, 0, 0]), "page": block.get("page", 0)},
        "font": {
            "name": font_summary.get("dominant_font", "Unknown"),
            "size": font_summary.get("dominant_size", DEFAULT_FONT_SIZE),
        },
        "font_summary": font_summary,
        "fonts": [
            {"name": d["name"], "size": d["size"], "count": d["count"]}
            for d in font_details.values()
        ],
    }


def summarize_fonts(font_details: Dict[str, Dict]) -> Dict:
    """Dominant font by char count; average size over the dominant
    font's variants weighted by count (layout_analyzer.py:136-155)."""
    if not font_details:
        return {}
    dominant = max(font_details.values(), key=lambda x: x["count"])
    sizes: List[float] = []
    for details in font_details.values():
        if details["name"] == dominant["name"]:
            sizes.extend([details["size"]] * details["count"])
    avg_size = sum(sizes) / len(sizes) if sizes else dominant["size"]
    return {
        "dominant_font": dominant["name"],
        "dominant_size": avg_size,
        "font_variants": len(font_details),
    }


def analyze_page(page_dict: Dict, page_num: int) -> Dict:
    """One page dict -> text blocks (type 0), image blocks (type 1)
    with bbox/width/height, per-block fonts (layout_analyzer.py:34-59)."""
    layout = {
        "page": page_num,
        "width": page_dict.get("width", 0),
        "height": page_dict.get("height", 0),
        "blocks": [],
        "fonts": [],
        "images": [],
    }
    for block in page_dict.get("blocks", []):
        if block.get("type") == 0:
            info = process_text_block(block)
            layout["blocks"].append(info)
            layout["fonts"].extend(info["fonts"])
        elif block.get("type") == 1:
            layout["images"].append(
                {
                    "bbox": block.get("bbox", [0, 0, 0, 0]),
                    "width": block.get("width", 0),
                    "height": block.get("height", 0),
                    "page": page_num,
                }
            )
    return layout


def analyze_layout(pages: List[Dict]) -> Dict:
    """Whole-document analysis over a list of page dicts
    (layout_analyzer.py:9-32): flat text_blocks, aggregated font
    histogram keyed "name_size", flat images — plus the per-page view."""
    layout = {"pages": [], "text_blocks": [], "fonts": {}, "images": []}
    for page_num, page_dict in enumerate(pages):
        page_layout = analyze_page(page_dict, page_num)
        layout["pages"].append(page_layout)
        layout["text_blocks"].extend(page_layout["blocks"])
        for font_info in page_layout["fonts"]:
            font_key = f"{font_info['name']}_{font_info['size']}"
            layout["fonts"][font_key] = layout["fonts"].get(font_key, 0) + font_info["count"]
        layout["images"].extend(page_layout["images"])
    return layout


def is_heading_block(text: str, font_name: str, font_size: float) -> bool:
    """The reference's font-heading heuristic (pdf_parser.py:215-219):
    size >= 12, or a CMBX (Computer Modern bold) font, or any
    fully-uppercase word in the block."""
    return (
        font_size >= 12
        or font_name.startswith("CMBX")
        or any(word.strip().isupper() for word in text.split())
    )


def integrate_layout(text_data: Dict, layout_data: Dict) -> Dict:
    """Merge extracted text/tables with layout blocks into the typed
    content stream the section detector consumes
    (pdf_parser.py:201-239)."""
    integrated = {
        "content": [],
        "raw_text": text_data.get("raw_text", ""),
        "metadata": text_data.get("metadata", {}),
    }
    for block in layout_data.get("text_blocks", []):
        if not block.get("text", "").strip():
            continue
        font_size = block.get("font", {}).get("size", DEFAULT_FONT_SIZE)
        font_name = block.get("font", {}).get("name", "")
        is_heading = is_heading_block(block["text"], font_name, font_size)
        integrated["content"].append(
            {
                "text": block["text"],
                "type": "heading" if is_heading else "text",
                "position": block.get("position", {}),
                "font": {"size": font_size, "name": font_name},
            }
        )
    for table in text_data.get("tables", []):
        if table.get("data"):
            integrated["content"].append(
                {"type": "table", "data": table["data"], "page": table.get("page")}
            )
    return integrated


def layout_to_spans(integrated: Dict, layout_data: Optional[Dict] = None) -> List[Dict]:
    """Typed content stream -> the engine's interleaved span rows
    (kind, text, media_ref, offset). Image blocks carry their
    bbox/width/height metadata in media_ref (the span model's media
    payload pointer)."""
    import json

    spans: List[Dict] = []

    def add(kind: str, text: str, media_ref: str = ""):
        spans.append(
            {"kind": kind, "text": text, "media_ref": media_ref, "offset": len(spans)}
        )

    for entry in integrated.get("content", []):
        kind = entry.get("type", "text")
        if kind == "table":
            add("table", json.dumps(entry.get("data")), "")
        else:
            add(kind, entry.get("text", ""), "")
    for img in (layout_data or {}).get("images", []):
        meta = {
            "page": img.get("page", 0),
            "bbox": list(img.get("bbox", [0, 0, 0, 0])),
            "width": img.get("width", 0),
            "height": img.get("height", 0),
        }
        add("image", "", "layout-image://" + json.dumps(meta, sort_keys=True))
    return spans
