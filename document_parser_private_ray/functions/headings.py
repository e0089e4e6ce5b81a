"""Heading/block splitter (operator M1, SURVEY.md §2.2).

Splits raw resume text into ordered heading/text blocks following the
reference TextParser semantics (/root/reference/parsing_engine/
text_parser.py:41-76): blank lines close the current text block; a line
that *exactly* matches the anchored heading alternation becomes its own
heading block. This is the text-mode span extractor: its output feeds
the interleaved-span model (kind: "heading" | "text").

Pure function of the input string — safe for stateless ``map_batches``
tasks; the pattern is compiled once per worker at import time.
"""

from __future__ import annotations

import re
from typing import Dict, List

# Anchored, whole-line heading alternation (text_parser.py:47-54).
HEADING_PATTERN = re.compile(
    r"^\s*(CONTACT(\s*INFO)?|(PROFESSIONAL\s+)?SUMMARY|PROFILE|OBJECTIVE|"
    r"(WORK|PROFESSIONAL|EMPLOYMENT)\s+EXPERIENCE|EXPERIENCE|"
    r"CAREER\s+(HISTORY|PATH)|(ACADEMIC\s+)?EDUCATION|QUALIFICATIONS|DEGREES|"
    r"TRAINING|CERTIFICATIONS?|(TECHNICAL\s+)?SKILLS|COMPETENCIES|EXPERTISE|"
    r"(KEY\s+)?PROJECTS|PORTFOLIO|PERSONAL\s+DETAILS|ABOUT\s+ME"
    r")\s*:?\s*$",
    re.IGNORECASE,
)


def is_heading(line: str) -> bool:
    """True when the stripped line exactly matches the heading alternation."""
    return bool(HEADING_PATTERN.match(line.strip()))


def split_blocks(raw_text: str) -> List[Dict[str, str]]:
    """raw text -> ordered [{"kind": "heading"|"text", "text": ...}, ...].

    Text blocks keep their original (unstripped) lines joined by newlines;
    heading blocks carry the stripped heading line — matching
    text_parser.py:56-76.
    """
    blocks: List[Dict[str, str]] = []
    current: List[str] = []

    def flush():
        if current:
            blocks.append({"kind": "text", "text": "\n".join(current)})
            current.clear()

    for line in raw_text.split("\n"):
        stripped = line.strip()
        if not stripped:
            flush()
            continue
        if HEADING_PATTERN.match(stripped):
            flush()
            blocks.append({"kind": "heading", "text": stripped})
        else:
            current.append(line)
    flush()
    return blocks
