"""Section detector (M4) — line-state machine semantics of
section_detector.py:31-161 over the smoke-test-style sample resume."""

from document_parser_private_ray.functions.sections import (
    SectionDetector,
    reconstruct_raw_text,
)

D = SectionDetector()

SAMPLE = """555-123-4567
John Smith
New York, NY
john.smith@example.com

SUMMARY
Passionate builder of scalable backend systems.

TECHNICAL SKILLS
Python, Java, Docker; Kubernetes • Git

EDUCATION
BSc Computer Science, MIT (2015 - 2019)
GPA: 3.8

WORK EXPERIENCE
Software Engineer, Acme Software Inc (Jan 2020 - Present)
• Built data pipelines

PROJECTS
Stocktake - a warehouse management system

CERTIFICATIONS
Oracle Certified Java Programmer"""


def test_detects_all_sections():
    sections = D.detect(SAMPLE)
    present = D.detect_present(SAMPLE)
    assert present == [
        "contact", "summary", "skills", "education", "experience",
        "projects", "certifications",
    ]
    # phone line flips state to contact; following lines accumulate
    assert "John Smith" in sections["contact"]
    assert "john.smith@example.com" in sections["contact"]
    assert "Passionate builder" in sections["summary"]
    assert "Kubernetes" in sections["skills"]
    assert "MIT" in sections["education"]
    assert "Acme Software Inc" in sections["experience"]
    assert "Stocktake" in sections["projects"]
    assert "Oracle Certified" in sections["certifications"]


def test_experience_substring_quirk():
    # 'experience' is a substring pattern: the word "Experienced" inside a
    # summary flips the state machine to experience (reference semantics)
    sections = D.detect("SUMMARY\nExperienced engineer who ships.")
    assert "Experienced engineer" in sections["experience"]
    assert sections["summary"] == "SUMMARY\n"


def test_heading_line_included_in_content():
    sections = D.detect("SUMMARY\nsome text")
    assert sections["summary"] == "SUMMARY\nsome text\n"


def test_date_heuristic_flips_to_experience():
    # a dated line with no preceding heading -> inferred experience
    sections = D.detect("random intro\nJan 2020 - Dec 2021 worked on stuff")
    assert "worked on stuff" in sections["experience"]
    assert sections["experience"].count("\n") == 1


def test_date_heuristic_does_not_leave_education():
    text = "EDUCATION\nBSc, MIT\n2015 - 2019 coursework"
    sections = D.detect(text)
    assert "2015 - 2019 coursework" in sections["education"]
    assert sections["experience"] == ""


def test_colon_and_allcaps_special_case():
    # "SKILLS:" fails plain search for '^skills$' but matches after colon strip
    sections = D.detect("SKILLS:\nPython")
    assert "Python" in sections["skills"]


def test_fallback_content_section():
    raw = "just some prose\nwith nothing resume-like"
    sections = D.detect(raw)
    assert sections["content"] == raw
    assert D.detect_present(raw) == ["content"]


def test_lines_before_any_section_dropped():
    sections = D.detect("no match here\nSUMMARY\ntext after")
    assert "no match here" not in "".join(sections.values())


def test_custom_pattern_override():
    """Extension surface (SURVEY §2.7): user-supplied section regex
    banks replace the defaults, same shape as parsing_rules.yaml."""
    custom = SectionDetector(
        patterns={
            "skills": [r"^superpowers$"],
            "experience": [r"battle\s+history"],
        }
    )
    sections = custom.detect("SUPERPOWERS\nflight, x-ray vision\n\nBattle History\nfought crime")
    assert "flight, x-ray vision" in sections["skills"]
    assert "fought crime" in sections["experience"]
    # default-only patterns no longer match; the output vocabulary is
    # the CUSTOM one (fixed names are absent, not empty)
    assert custom.detect("SUMMARY\ntext").get("summary", "") == ""


def test_reconstruct_raw_text_skips_media():
    kinds = ["heading", "text", "image", "text"]
    texts = ["SUMMARY", "hello", "", "world"]
    assert reconstruct_raw_text(kinds, texts) == "SUMMARY\nhello\nworld"
