"""PII detection / anonymization (T3 + N15/N16/N18/N19, SURVEY §2.3/2.4).

Regex-recognizer engine with the same rule surface and replacement
strategies as /root/reference/parsing_engine/pii_handler.py (presidio is
unavailable offline; the reference only ever feeds presidio custom
regex ``PatternRecognizer``s built from config, so a pure-regex engine
reproduces the semantics):

  * detection rules: {ENTITY_TYPE: [regex, ...]} (config/pii.yaml shape);
  * ``hash``  strategy -> ``[TYPE_xxxxxxxx]`` with sha256(value+salt)[:8]
    (pii_handler.py:103-104);
  * ``mask``  strategy -> email ``j***@dom``, phone ``123***7890``, else
    ``[TYPE_REDACTED]`` (:52-70);
  * ``token`` strategy -> ``[TYPE_n]`` with per-DOCUMENT counters — the
    reference's per-instance counters depend on call history and don't
    survive distribution (SURVEY §4.3), so counters reset per call here;
  * pii entries carry ``{replacement, type, original, context}`` with the
    ±50-char ellipsed context window (:106-114).

Divergence (documented): the reference keys presidio operators by entity
type inside its result loop, so the LAST entity of a type silently wins
for every occurrence in the anonymized text (:76). This engine replaces
each occurrence with its own per-entity replacement — the per-entity
``pii_map`` both engines produce is identical.

Overlap resolution (engine-defined, deterministic): matches sorted by
(start, -length, rule order); any match overlapping an already accepted
one is dropped.
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Tuple

from ..config import PII_RULES


class PIIAnonymizer:
    def __init__(self, config: Optional[dict] = None):
        config = config or PII_RULES
        self.replacement_strategy = config.get("replacement_strategy", "hash")
        self.salt = config.get("hash_salt", "secure_salt_value")
        rules = config.get("detection_rules", PII_RULES["detection_rules"])
        # presidio compiles recognizer patterns with
        # IGNORECASE | DOTALL | MULTILINE — mirrored here
        flags = re.IGNORECASE | re.DOTALL | re.MULTILINE
        self.recognizers: List[Tuple[str, re.Pattern]] = [
            (entity_type.upper(), re.compile(pattern, flags))
            for entity_type, patterns in rules.items()
            for pattern in patterns
        ]

    # -- detection -----------------------------------------------------
    def analyze(self, text: str) -> List[Tuple[int, int, str]]:
        """-> [(start, end, entity_type)] non-overlapping, sorted by start."""
        candidates: List[Tuple[int, int, int, str]] = []
        for rule_idx, (entity_type, pattern) in enumerate(self.recognizers):
            for m in pattern.finditer(text):
                candidates.append((m.start(), -(m.end() - m.start()), rule_idx, entity_type))
        candidates.sort()
        accepted: List[Tuple[int, int, str]] = []
        last_end = -1
        for start, neg_len, _, entity_type in sorted(
            candidates, key=lambda c: (c[0], c[1], c[2])
        ):
            end = start - neg_len
            if start >= last_end:
                accepted.append((start, end, entity_type))
                last_end = end
        return accepted

    # -- N15 -----------------------------------------------------------
    def _hash_value(self, value: str) -> str:
        return hashlib.sha256(f"{value}{self.salt}".encode()).hexdigest()[:8]

    # -- N16 -----------------------------------------------------------
    @staticmethod
    def _get_context(text: str, start: int, end: int, window: int = 50) -> str:
        cs, ce = max(0, start - window), min(len(text), end + window)
        prefix = "..." if cs > 0 else ""
        suffix = "..." if ce < len(text) else ""
        return f"{prefix}{text[cs:ce]}{suffix}"

    def _replacement_for(self, entity_type: str, original: str, counters: Dict[str, int]) -> str:
        if self.replacement_strategy == "hash":
            return f"[{entity_type}_{self._hash_value(original)}]"
        if self.replacement_strategy == "mask":
            if entity_type == "EMAIL":
                parts = original.split("@")
                if len(parts) == 2 and parts[0]:
                    return f"{parts[0][0]}***@{parts[1]}"
                return "[EMAIL_REDACTED]"
            if entity_type == "PHONE":
                digits = re.sub(r"\D", "", original)
                if len(digits) >= 7:
                    return f"{digits[:3]}***{digits[-4:]}"
                return "[PHONE_REDACTED]"
            return f"[{entity_type}_REDACTED]"
        # token strategy: per-document counters
        counters[entity_type] = counters.get(entity_type, 0) + 1
        return f"[{entity_type}_{counters[entity_type]}]"

    # -- N18 -----------------------------------------------------------
    def anonymize(self, text: str) -> Tuple[str, List[Dict[str, str]]]:
        """-> (anonymized_text, pii_map) where pii_map is a list of
        {"replacement", "type", "original", "context"} in text order."""
        results = self.analyze(text)
        counters: Dict[str, int] = {}
        pii_map: List[Dict[str, str]] = []
        pieces: List[str] = []
        cursor = 0
        for start, end, entity_type in results:
            original = text[start:end]
            replacement = self._replacement_for(entity_type, original, counters)
            pii_map.append(
                {
                    "replacement": replacement,
                    "type": entity_type,
                    "original": original,
                    "context": self._get_context(text, start, end),
                }
            )
            pieces.append(text[cursor:start])
            pieces.append(replacement)
            cursor = end
        pieces.append(text[cursor:])
        return "".join(pieces), pii_map

    # -- N19 -----------------------------------------------------------
    @staticmethod
    def restore_original(anonymized_text: str, pii_map: List[Dict[str, str]]) -> str:
        restored = anonymized_text
        for entry in pii_map:
            restored = restored.replace(entry["replacement"], entry["original"])
        return restored
