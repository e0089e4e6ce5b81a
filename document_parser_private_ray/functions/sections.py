"""Section detector (operator M4, SURVEY.md §2.2) — the line-state
machine of /root/reference/parsing_engine/section_detector.py:31-161.

Semantics preserved exactly:
  * per stripped non-empty line, try the per-section regex banks in
    section order; first section with any ``search`` hit wins and flips
    the current-section state, with the heading line itself included in
    the section content;
  * special case: a line ending with ':' or in ALL CAPS is retried with
    the colon stripped (section_detector.py:124-131);
  * date heuristic: a non-heading line containing a date-range/month-year
    pattern flips state to "experience" unless already in experience or
    education (151-161 + 58-64);
  * other lines append to the current section (lines before any heading
    are dropped);
  * fallback: if nothing was detected, the whole raw text lands in an
    extra "content" section (93-100).

The regex banks are compiled once per process at module import (stage
T6): safe for stateless ``map_batches`` tasks.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence

from ..config import SECTION_NAMES, SECTION_PATTERNS

_DATE_HINT_PATTERNS = tuple(
    re.compile(p, re.IGNORECASE)
    for p in (
        r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}\s*[-–]\s*"
        r"(?:(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}|Present|Current)\b",
        r"\b\d{4}\s*[-–]\s*(?:\d{4}|Present|Current)\b",
        r"\b(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+\d{4}\b",
    )
)


def _compile_banks(patterns: Dict[str, List[str]]):
    return {
        section: [re.compile(p, re.IGNORECASE) for p in pats]
        for section, pats in patterns.items()
    }


_DEFAULT_BANKS = _compile_banks(SECTION_PATTERNS)


class SectionDetector:
    """Compiled-regex section detector. Construct once per worker."""

    def __init__(self, patterns: Optional[Dict[str, List[str]]] = None):
        if patterns is None:
            self.banks = _DEFAULT_BANKS
        else:
            self.banks = _compile_banks(patterns)

    def match_section_heading(self, text: str) -> Optional[str]:
        if not text:
            return None
        for section, bank in self.banks.items():
            for pattern in bank:
                if pattern.search(text):
                    return section
        if text.endswith(":") or text.isupper():
            clean = text.rstrip(":")
            for section, bank in self.banks.items():
                for pattern in bank:
                    if pattern.search(clean):
                        return section
        return None

    @staticmethod
    def contains_date_pattern(text: str) -> bool:
        return any(p.search(text) for p in _DATE_HINT_PATTERNS)

    def detect(self, raw_text: str) -> Dict[str, str]:
        """raw text -> {section_name: content_string} over the fixed
        vocabulary (every name present, possibly empty), plus "content"
        when the fallback fires."""
        sections: Dict[str, str] = {name: "" for name in SECTION_NAMES}
        current: Optional[str] = None

        for line in raw_text.split("\n"):
            line = line.strip()
            if not line:
                continue
            hit = self.match_section_heading(line)
            if hit:
                current = hit
                sections[current] += line + "\n"
            elif self.contains_date_pattern(line):
                if current not in ("experience", "education"):
                    current = "experience"
                sections[current] += line + "\n"
            elif current:
                sections[current] += line + "\n"

        if not any(content.strip() for content in sections.values()):
            sections["content"] = raw_text
        return sections

    def detect_present(self, raw_text: str) -> List[str]:
        """Names of sections with non-empty content, in vocabulary order
        ("content" last when the fallback fired)."""
        detected = self.detect(raw_text)
        order = list(SECTION_NAMES) + ["content"]
        return [n for n in order if detected.get(n, "").strip()]


def reconstruct_raw_text(kinds: Sequence[str], texts: Sequence[str]) -> str:
    """Rebuild the document's raw text from its span sequence: textual
    spans (kind "text"/"heading") joined by newlines in offset order.
    Media spans (image/table) carry no raw text (SURVEY §1.5 mapping)."""
    return "\n".join(t for k, t in zip(kinds, texts) if k in ("text", "heading"))
