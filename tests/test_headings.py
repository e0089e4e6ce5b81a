"""Heading/block splitter (M1) against test_TextParser.py:193-233 tables."""

import pytest

from document_parser_private_ray.functions.headings import is_heading, split_blocks


@pytest.mark.parametrize(
    "heading",
    [
        "SUMMARY", "summary", "Summary", "SUMMARY:", "SUMMARY :", "  SUMMARY  ",
        "PROFESSIONAL SUMMARY", "WORK EXPERIENCE", "SKILLS", "EDUCATION",
        "CONTACT INFO", "PERSONAL DETAILS", "ABOUT ME", "ACADEMIC EDUCATION",
        "TECHNICAL SKILLS", "PROFILE", "OBJECTIVE", "CERTIFICATIONS", "PROJECTS",
    ],
)
def test_headings_match(heading):
    assert is_heading(heading)
    blocks = split_blocks(f"{heading}\nContent")
    assert [b["kind"] for b in blocks] == ["heading", "text"]
    assert blocks[0]["text"] == heading.strip()


@pytest.mark.parametrize(
    "non_heading",
    [
        "Not a heading", "Summary of qualifications", "Education history",
        "Contact information", "SKILLS SECTION", "END OF SUMMARY",
        "Details about my education",
    ],
)
def test_non_headings(non_heading):
    assert not is_heading(non_heading)
    blocks = split_blocks(f"{non_heading}\nContent")
    assert len(blocks) == 1
    assert blocks[0]["kind"] == "text"
    assert non_heading in blocks[0]["text"] and "Content" in blocks[0]["text"]


def test_blank_lines_close_blocks():
    blocks = split_blocks("SUMMARY\nLine 1\nLine 2\n\nLine 3")
    assert [b["kind"] for b in blocks] == ["heading", "text", "text"]
    assert blocks[1]["text"] == "Line 1\nLine 2"
    assert blocks[2]["text"] == "Line 3"
