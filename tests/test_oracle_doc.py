"""Single-document oracle: full chain over a hand-built interleaved
span document (structure mirrors the committed reference golden,
sample_expected_output_for_AM CV.json fields)."""

from document_parser_private_ray.oracle import DocumentOracle

ORACLE = DocumentOracle()

KINDS = [
    "heading", "text",          # contact
    "heading", "text",          # summary
    "image",
    "heading", "text",          # skills
    "heading", "text",          # education
    "heading", "text", "text",  # experience x2
    "table",
    "heading", "text",          # projects
    "heading", "text",          # certifications
]
TEXTS = [
    "CONTACT INFO",
    "555-123-4567\nJohn Smith\nNew York, NY\njohn.smith@example.com\nlinkedin.com/in/john-smith\ngithub.com/johnsmith",
    "SUMMARY",
    "Passionate builder of scalable backend systems.",
    "",
    "TECHNICAL SKILLS",
    "Python3, Javascrpt; Docker • Languages: Java, Go",
    "EDUCATION",
    "BSc Computer Science, MIT (Sep 2015 - 2019)\nGPA: 3.8",
    "WORK EXPERIENCE",
    "Software Engineer, Acme Software Inc (Jan 2020 - Dec 2021)\n• Built data pipelines using Python",
    "BCX Group, Consultant (2022 - Present)\n• Advised on cloud migrations",
    '[["H1","H2"],["a","b"]]',
    "PROJECTS",
    "Stocktake - a warehouse management system",
    "CERTIFICATIONS",
    "Oracle Certified Java Programmer",
]
MEDIA = ["" if k in ("heading", "text") else f"media://doc-x/{i}" for i, k in enumerate(KINDS)]


def test_out_spans_structure():
    out = ORACLE.process("doc-x", KINDS, TEXTS, MEDIA)
    spans = out["out_spans"]
    # dense 0-based order
    assert [s["order"] for s in spans] == list(range(len(spans)))
    section_spans = [s for s in spans if s["media_ref"] == ""]
    media_spans = [s for s in spans if s["media_ref"] != ""]
    assert [s["kind"] for s in section_spans] == [
        "contact", "summary", "skills", "education", "experience",
        "projects", "certifications",
    ]
    # media pass-through in original relative order, after sections
    assert [s["kind"] for s in media_spans] == ["image", "table"]
    assert media_spans[0]["media_ref"] == "media://doc-x/4"
    assert media_spans[1]["text"] == '[["H1","H2"],["a","b"]]'
    assert spans.index(media_spans[0]) > spans.index(section_spans[-1])


def test_resume_contents():
    out = ORACLE.process("doc-x", KINDS, TEXTS, MEDIA)
    resume = out["resume"]
    contact = resume["contact"]
    assert contact["email"] == "john.smith@example.com"
    assert contact["phone"] == "555-123-4567"
    assert contact["linkedin"] == "linkedin.com/in/john-smith"
    assert contact["github"] == "github.com/johnsmith"
    # heading line is part of section content (section_detector.py:57),
    # so the whitespace-collapsed summary starts with it
    assert resume["summary"] == "SUMMARY Passionate builder of scalable backend systems."
    # fuzzy + exact + category-split skill normalization
    assert "Python" in resume["skills"]
    assert "JavaScript" in resume["skills"]
    assert "Docker" in resume["skills"]
    # entry split at ALL-CAPS-ish line starts gives 3 entries (heading,
    # degree line, GPA line) — faithful to entity_extractor.py:135
    assert len(resume["education"]) == 3
    edu = resume["education"][1]
    # NER-less institution fallback captures only the indicator word, so
    # normalization yields "Unknown" (entity_extractor.py:288-297 +
    # education_normalizer.py:52-89 semantics)
    assert edu["institution"] == "Unknown"
    assert edu["degree"] == "Bachelor of Science"
    assert edu["field_of_study"] == "computer science"
    assert edu["start_date"] == "2015-01-01"  # month drowned in prose
    assert edu["end_date"] == "2019-01-01"
    assert len(resume["experience"]) == 2
    exp0 = resume["experience"][0]
    assert exp0["company"] == "Acme Software"
    assert exp0["position"].lower().startswith("software engineer")
    assert exp0["start_date"] == "2020-01-01"
    assert exp0["end_date"] == "2021-12-01"
    assert exp0["duration_months"] == 23
    # heading line becomes its own (junk) first project — faithful
    assert [p["name"] for p in resume["projects"]] == [
        "PROJECTS",
        "Stocktake - a warehouse management system",
    ]
    # cert heading line merges into the entry (no [A-Z][^a-z] split point)
    assert resume["certifications"] == ["CERTIFICATIONS\nOracle Certified Java Programmer"]


def test_fallback_only_document():
    out = ORACLE.process("doc-y", ["text"], ["plain prose, nothing else"], [""])
    spans = out["out_spans"]
    assert len(spans) == 1
    assert spans[0]["kind"] == "content"
    assert spans[0]["text"] == "plain prose, nothing else"


def test_determinism():
    a = ORACLE.process("doc-x", KINDS, TEXTS, MEDIA)
    b = ORACLE.process("doc-x", KINDS, TEXTS, MEDIA)
    assert a == b
