"""Education normalizer (T5/N5-N9) — impl semantics
(education_normalizer.py; empty/unmatched institution -> "Unknown")."""

from document_parser_private_ray.functions.education import EducationNormalizer

N = EducationNormalizer()


def test_institution_exact_variant():
    assert N.normalize_institution("MIT") == "Massachusetts Institute of Technology"
    assert N.normalize_institution("UCT") == "University of Cape Town"


def test_institution_indicator_stripping_then_match():
    # "Stanford University" -> indicators removed -> "Stanford" (a variant)
    assert N.normalize_institution("Stanford University") == "Stanford University"


def test_institution_fuzzy():
    assert N.normalize_institution("Stanfrd University") == "Stanford University"


def test_institution_unknown():
    assert N.normalize_institution("") == "Unknown"
    assert N.normalize_institution(None) == "Unknown"
    assert N.normalize_institution("Zebra Zebra Zebra Qx") == "Unknown"


def test_degree_abbrev_expansion():
    assert N.normalize_degree("BS") == "Bachelor of Science"
    assert N.normalize_degree("B.S.") == "Bachelor of Science"
    assert N.normalize_degree("MBA") == "Master of Business Administration"
    assert N.normalize_degree("PhD") == "Doctor of Philosophy"


def test_degree_word_rewrites():
    # Masters->Master, in->of, trailing Degree dropped
    assert N.normalize_degree("Masters in Science Degree") == "Master of Science"


def test_degree_exact_and_fuzzy():
    assert N.normalize_degree("BSc") == "Bachelor of Science"
    assert N.normalize_degree("Matric") == "National Senior Certificate"
    assert N.normalize_degree("Bachelor of Sciences") == "Bachelor of Science"


def test_degree_empty():
    assert N.normalize_degree("") == ""
    assert N.normalize_degree(None) == ""


def test_field_expansion_and_camelcase():
    assert N.normalize_field("CS") == "Computer Science"
    assert N.normalize_field("MIS") == "Management Information Systems"
    assert N.normalize_field("DataScience") == "Data Science"
    assert N.normalize_field("") == ""


def test_gpa():
    assert N.normalize_gpa("GPA: 3.8") == 3.8
    assert N.normalize_gpa("3.75") == 3.75
    assert N.normalize_gpa("3.8 out of 4.0") is None  # scale mention -> None
    assert N.normalize_gpa("no numbers") is None
    assert N.normalize_gpa(None) is None


def test_entry_normalize_achievements_mining():
    entries = [
        {
            "institution": "MIT",
            "degree": "BSc",
            "field_of_study": "CS",
            "start_date": "Sep 2015",
            "end_date": "2019",
            "description": "BSc at MIT\nAchievements:\nDean's list 2017\n• Graduated cum laude",
        }
    ]
    out = N.normalize(entries)[0]
    assert "Graduated cum laude" in out["achievements"]
    assert "Dean's list 2017" in out["achievements"]
    assert out["end_date"] == "2019-01-01"
    assert out["start_date"] == "2015-09-01"


def test_entry_normalize_indicator_lines():
    entries = [{"description": "Studied things\nAwarded best thesis prize"}]
    out = N.normalize(entries)[0]
    assert out["achievements"] == ["Awarded best thesis prize"]


def test_entry_normalize_default_achievement():
    out = N.normalize([{"description": "Just a line"}])[0]
    assert out["achievements"] == ["Successfully completed coursework and requirements"]
