"""Experience normalizer (T5/N10-N14) — impl semantics
(experience_normalizer.py, incl. the company-index exact-check quirk)."""

from datetime import date

from document_parser_private_ray.functions.experience import (
    ExperienceNormalizer,
    months_between,
)

N = ExperienceNormalizer()


def test_company_suffix_strip_and_exact():
    assert N.normalize_company("Acme Software Inc") == "Acme Software"
    assert N.normalize_company("Globex Corporation") == "Globex"
    assert N.normalize_company("Takealot") == "Takealot.com"


def test_company_fuzzy():
    assert N.normalize_company("Acme Sofware") == "Acme Software"


def test_company_no_match_returns_original():
    assert N.normalize_company("Totally Unknown Startup Qzx") == "Totally Unknown Startup Qzx"
    assert N.normalize_company("") == ""
    assert N.normalize_company(None) == ""


def test_title_abbreviation_expansion():
    assert N.normalize_title("Sr. SWE") == "Senior Software Engineer"
    # expands to "Junior Developer"; no >=90 fuzzy title hit -> expanded kept
    assert N.normalize_title("Jr. Developer") == "Junior Developer"
    assert N.normalize_title("SWE") == "Software Engineer"


def test_title_exact_quirk_goes_fuzzy():
    # titles never exact-match (exact check is against the company index);
    # "Software Developer" still resolves via fuzzy >= 90
    assert N.normalize_title("Software Developer") == "Software Engineer"


def test_title_no_match_returns_expanded():
    assert N.normalize_title("Chief Vibes Officer") == "Chief Vibes Officer"
    assert N.normalize_title("") == ""


def test_description_cleaning():
    desc = "• built stuff\n- more stuff\nplain line"
    assert N.normalize_description(desc) == "Built stuff more stuff plain line"
    assert N.normalize_description("") == ""


def test_months_between():
    assert months_between(date(2020, 1, 1), date(2020, 3, 1)) == 2
    assert months_between(date(2020, 1, 15), date(2020, 3, 10)) == 2  # +1 leftover days
    assert months_between(date(2020, 1, 1), date(2021, 1, 1)) == 12


def test_calculate_duration():
    assert N.calculate_duration("Jan 2020", "Jan 2021") == 12
    assert N.calculate_duration(date(2021, 1, 1), date(2020, 1, 1)) == 0  # inversion
    assert N.calculate_duration(None, date(2020, 1, 1)) == 0
    # open-ended -> frozen today (2026-01-01)
    assert N.calculate_duration(date(2025, 1, 1), None) == 12


def test_entry_normalize():
    entries = [
        {
            "company": "Globex Corporation",
            "position": "Sr. SWE",
            "description": "• did things\n• more things",
            "technologies": ["Python3", "JS"],
            "start_date": "Jan 2020",
            "end_date": "Jan 2022",
        }
    ]
    out = N.normalize(entries)[0]
    assert out["company"] == "Globex"
    assert out["position"] == "Senior Software Engineer"
    assert out["description"] == "Did things more things"
    assert out["technologies"] == ["JavaScript", "Python"]
    assert out["start_date"] == date(2020, 1, 1)
    assert out["duration_months"] == 24
