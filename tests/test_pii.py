"""PII engine (T3/N15-N19) — strategies and map shape
(re-encoded from test_pii_anonymizer.py against the regex engine)."""

import hashlib

from document_parser_private_ray.functions.pii import PIIAnonymizer

BASE = {
    "detection_rules": {
        "EMAIL": [r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"],
        "PHONE": [r"\b(?:\+\d{1,2}\s?)?(?:\(\d{3}\)|\d{3})[-.\s]?\d{3}[-.\s]?\d{4}\b"],
        "SSN": [r"\b\d{3}[-]?\d{2}[-]?\d{4}\b"],
        "ADDRESS": [
            r"\b\d{1,5}\s[\w\s]{1,20}(?:street|st|avenue|ave|road|rd|lane|ln|drive|dr|boulevard|blvd)\b"
        ],
    },
    "replacement_strategy": "hash",
    "hash_salt": "test_salt_123",
}


def make(strategy="hash"):
    cfg = dict(BASE, replacement_strategy=strategy)
    return PIIAnonymizer(cfg)


def test_defaults():
    a = PIIAnonymizer({"detection_rules": BASE["detection_rules"]})
    assert a.replacement_strategy == "hash"
    assert a.salt == "secure_salt_value"


def test_hash_strategy():
    a = make("hash")
    text = "Contact: John Doe, email: johndoe@example.com"
    anonymized, pii_map = a.anonymize(text)
    assert len(pii_map) == 1
    entry = pii_map[0]
    assert entry["type"] == "EMAIL"
    assert entry["original"] == "johndoe@example.com"
    expected_hash = hashlib.sha256(b"johndoe@example.comtest_salt_123").hexdigest()[:8]
    assert entry["replacement"] == f"[EMAIL_{expected_hash}]"
    assert entry["replacement"] in anonymized
    assert "johndoe@example.com" not in anonymized


def test_mask_strategy_email_phone_generic():
    a = make("mask")
    anonymized, _ = a.anonymize("Email: johndoe@example.com")
    assert "j***@example.com" in anonymized
    anonymized, _ = a.anonymize("Call 123-456-7890")
    assert "123***7890" in anonymized
    anonymized, _ = a.anonymize("SSN: 123-45-6789")
    assert "[SSN_REDACTED]" in anonymized


def test_token_strategy_per_document_counters():
    a = make("token")
    text = "a@b.com then c@d.com and 123-456-7890"
    anonymized, pii_map = a.anonymize(text)
    reps = [e["replacement"] for e in pii_map]
    assert reps == ["[EMAIL_1]", "[EMAIL_2]", "[PHONE_1]"]
    # fresh call -> counters reset (per-document determinism, SURVEY §4.3)
    _, pii_map2 = a.anonymize("x@y.com")
    assert pii_map2[0]["replacement"] == "[EMAIL_1]"


def test_context_window():
    a = make("hash")
    text = "x" * 100 + " a@b.com " + "y" * 100
    _, pii_map = a.anonymize(text)
    ctx = pii_map[0]["context"]
    assert ctx.startswith("...") and ctx.endswith("...")
    assert "a@b.com" in ctx


def test_restore_original():
    a = make("hash")
    text = "mail me: someone@example.org please"
    anonymized, pii_map = a.anonymize(text)
    assert PIIAnonymizer.restore_original(anonymized, pii_map) == text


def test_address_detection():
    a = make("hash")
    _, pii_map = a.anonymize("I live at 123 Main Street in town")
    assert any(e["type"] == "ADDRESS" for e in pii_map)


def test_1000_pii_stress():
    """Parity with the reference's large-text stress artifact
    (test_pii_anonymizer.py:314-324): 1,000 entities in one text."""
    a = make("hash")
    text = " | ".join(
        f"user{i}@example.com and {200 + i % 700}-555-{1000 + i:04d}"
        for i in range(500)
    )
    anonymized, pii_map = a.anonymize(text)
    emails = [e for e in pii_map if e["type"] == "EMAIL"]
    phones = [e for e in pii_map if e["type"] == "PHONE"]
    assert len(emails) == 500 and len(phones) == 500
    assert "@example.com" not in anonymized
    assert PIIAnonymizer.restore_original(anonymized, pii_map) == text


def test_many_entities():
    a = make("token")
    text = "\n".join(f"user{i}@example.com" for i in range(200))
    anonymized, pii_map = a.anonymize(text)
    assert len(pii_map) == 200
    assert pii_map[-1]["replacement"] == "[EMAIL_200]"
    assert "@example.com" not in anonymized
