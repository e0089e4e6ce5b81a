"""M2/M3 layout analysis vs the reference's mocked-page test cases
(test_LayoutAnalyzer.py re-encoded; value semantics follow the
reference IMPLEMENTATION — layout_analyzer.py — where its own tests
and implementation disagree, see functions/layout.py docstring)."""

from document_parser_private_ray.functions.layout import (
    analyze_layout,
    analyze_page,
    integrate_layout,
    is_heading_block,
    layout_to_spans,
    process_text_block,
    summarize_fonts,
)


def _text_block(bbox, spans):
    return {"type": 0, "bbox": bbox, "lines": [{"spans": spans}]}


def _image_block(bbox):
    return {
        "type": 1,
        "bbox": bbox,
        "width": bbox[2] - bbox[0],
        "height": bbox[3] - bbox[1],
    }


def _page1():
    return {
        "width": 600,
        "height": 800,
        "blocks": [
            _text_block((0, 0, 600, 100), [
                {"text": "Heading 1", "font": "Arial-Bold", "size": 16},
                {"text": " content", "font": "Arial", "size": 12},
            ]),
            _image_block((0, 100, 300, 200)),
            _text_block((0, 200, 600, 300), [
                {"text": "Paragraph text", "font": "Times-Roman", "size": 10}
            ]),
        ],
    }


def _page2():
    return {
        "width": 600,
        "height": 800,
        "blocks": [
            _text_block((0, 0, 600, 50), [
                {"text": "Footer text", "font": "Arial", "size": 8}
            ])
        ],
    }


def test_analyze_two_pages():
    layout = analyze_layout([_page1(), _page2()])
    assert len(layout["pages"]) == 2
    assert len(layout["fonts"]) == 4  # 4 unique name_size keys
    page1 = layout["pages"][0]
    assert page1["page"] == 0
    assert page1["width"] == 600 and page1["height"] == 800
    assert len(page1["blocks"]) == 2  # text blocks only
    assert len(page1["fonts"]) == 3
    assert len(page1["images"]) == 1
    assert len(layout["pages"][1]["blocks"]) == 1
    # font aggregation: counts use the STRIPPED span text
    # (layout_analyzer.py:68-97: text = span.strip(); count += len(text))
    assert layout["fonts"]["Arial-Bold_16.0"] == len("Heading 1")
    assert layout["fonts"]["Arial_12.0"] == len("content")  # stripped: 7
    assert layout["fonts"]["Times-Roman_10.0"] == len("Paragraph text")
    assert layout["fonts"]["Arial_8.0"] == len("Footer text")
    # aggregate views
    assert len(layout["text_blocks"]) == 3
    assert len(layout["images"]) == 1


def test_analyze_page_block_processing():
    page_layout = analyze_page(_page1(), 0)
    text_block = page_layout["blocks"][0]
    assert text_block["text"] == "Heading 1 content"
    assert text_block["bbox"] == (0, 0, 600, 100)
    assert text_block["font_summary"]["dominant_font"] == "Arial-Bold"
    assert text_block["font_summary"]["dominant_size"] == 16
    assert text_block["font_summary"]["font_variants"] == 2
    image_block = page_layout["images"][0]
    assert image_block["bbox"] == (0, 100, 300, 200)
    assert image_block["width"] == 300
    assert image_block["height"] == 100


def test_process_text_block_fonts():
    processed = process_text_block(_page1()["blocks"][0])
    assert processed["text"] == "Heading 1 content"
    assert len(processed["fonts"]) == 2
    fonts = {f"{f['name']}_{f['size']}": f for f in processed["fonts"]}
    assert fonts["Arial-Bold_16.0"]["count"] == len("Heading 1")
    assert fonts["Arial_12.0"]["count"] == len("content")
    # the integration-facing font key mirrors the summary
    assert processed["font"] == {"name": "Arial-Bold", "size": 16}


def test_summarize_fonts():
    font_details = {
        "font1": {"name": "Arial", "size": 12, "count": 100},
        "font2": {"name": "Arial-Bold", "size": 12, "count": 150},
        "font3": {"name": "Times", "size": 10, "count": 50},
    }
    summary = summarize_fonts(font_details)
    assert summary["dominant_font"] == "Arial-Bold"
    assert summary["dominant_size"] == 12
    assert summary["font_variants"] == 3
    assert summarize_fonts({}) == {}


def test_empty_document_and_empty_page():
    assert analyze_layout([]) == {"pages": [], "text_blocks": [], "fonts": {}, "images": []}
    page = analyze_layout([{"width": 600, "height": 800, "blocks": []}])["pages"][0]
    assert page["blocks"] == [] and page["fonts"] == [] and page["images"] == []


def test_font_size_fallbacks_and_dict_font():
    block = _text_block((0, 0, 1, 1), [
        {"text": "a", "font": {"name": "DictFont"}, "size": None, "font_size": 11},
        {"text": "b", "font": 42, "size": "not-a-number"},
    ])
    processed = process_text_block(block)
    fonts = {f["name"]: f for f in processed["fonts"]}
    assert fonts["DictFont"]["size"] == 11.0
    assert fonts["Unknown"]["size"] == 10.0


def test_heading_heuristic():
    # pdf_parser.py:215-219: size>=12 OR CMBX font OR any-uppercase-word
    assert is_heading_block("introduction", "Arial", 12.0)
    assert is_heading_block("introduction", "CMBX10", 8.0)
    assert is_heading_block("MY SKILLS section", "Arial", 8.0)
    assert not is_heading_block("plain body text", "Arial", 10.0)
    assert not is_heading_block("text with 123 numbers", "Arial", 11.9)


def test_integrate_layout_and_spans():
    layout = analyze_layout([_page1(), _page2()])
    text_data = {
        "raw_text": "Heading 1 content\nParagraph text\nFooter text",
        "tables": [{"page": 1, "data": [["a", "b"], ["1", "2"]]}],
        "metadata": {"title": "t"},
    }
    integrated = integrate_layout(text_data, layout)
    types = [c["type"] for c in integrated["content"]]
    # block1: dominant Arial-Bold 16 -> heading; block2: Times 10 but no
    # rule hit -> text; block3: Arial 8, no upper word -> text; + table
    assert types == ["heading", "text", "text", "table"]
    assert integrated["raw_text"] == text_data["raw_text"]

    spans = layout_to_spans(integrated, layout)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["heading", "text", "text", "table", "image"]
    assert [s["offset"] for s in spans] == list(range(5))
    img = spans[-1]
    assert img["media_ref"].startswith("layout-image://")
    assert '"width": 300' in img["media_ref"]
    assert '"height": 100' in img["media_ref"]


def test_layout_blocks_pipeline(ray_session):
    from document_parser_private_ray.pipelines.layout import (
        generate_layout_document,
        layout_blocks,
    )

    rows = layout_blocks(n_docs=40).take_all()
    assert len(rows) == 40
    assert all(r["n_blocks"] >= 0 and r["n_spans"] >= r["n_blocks"] for r in rows)
    # determinism: regenerating a doc gives the same page structure
    d1 = generate_layout_document(7)
    d2 = generate_layout_document(7)
    assert d1 == d2
    # at least some docs have headings and images across the corpus
    assert sum(r["n_headings"] for r in rows) > 0
    assert sum(r["n_images"] for r in rows) > 0
