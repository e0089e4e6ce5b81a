"""Date normalizer (N3/N4) against the reference's re-encoded fixture
table (test_DateNormalizer.py:41-107), impl semantics where tests
drifted (SURVEY §5.2)."""

from datetime import date

import pytest

from document_parser_private_ray.functions.dates import DateNormalizer

N = DateNormalizer(today=date(2026, 1, 1))


@pytest.mark.parametrize(
    "raw, expected",
    [
        ("Sep 2020", "2020-09-01"),
        ("DECEMBER 2025", "2025-12-01"),
        ("September 2023", "2023-09-01"),
        ("9/2021", "2021-09-01"),
        ("05/2022", "2022-05-01"),
        ("5-2022", "2022-05-01"),
        ("2024", "2024-01-01"),
        ("May2023", "2023-05-01"),
        ("In 1999", "1999-01-01"),
        ("Until 2005", "2005-01-01"),
        ("Apr-2025", "2025-04-01"),
        # strict formats (dateparser stand-in coverage)
        ("2023-12-31", "2023-12-31"),
        ("January 15, 2020", "2020-01-15"),
        ("15-Jan-2023", "2023-01-15"),
        ("02/28/2022", "2022-02-28"),
    ],
)
def test_fallback_and_formats(raw, expected):
    assert N.normalize(raw).isoformat() == expected


@pytest.mark.parametrize("raw", ["Random text", "Feb 30", "202", ""])
def test_invalid(raw):
    assert N.normalize(raw) is None


@pytest.mark.parametrize(
    "raw, expected",
    [
        # current-impl semantics (stale tests expected None — SURVEY §5.2)
        ("32/13/2020", "2020-01-01"),
        ("13/2022", "2022-01-01"),
        ("Q1 2023", "2023-01-01"),
        ("Feb 29 2021", "2021-01-01"),
    ],
)
def test_impl_quirks(raw, expected):
    assert N.normalize(raw).isoformat() == expected


@pytest.mark.parametrize("raw", ["Present", "Current", "ongoing", "now"])
def test_present_frozen_today(raw):
    assert N.normalize(raw) == date(2026, 1, 1)


@pytest.mark.parametrize(
    "month, num",
    [("jan", 1), ("JANUARY", 1), ("sept", 9), ("October", 10), ("dec", 12), ("invalid", 1)],
)
def test_month_mapping(month, num):
    assert N.normalize(f"{month} 2023") == date(2023, num, 1)


def test_extract_period():
    s, e = N.extract_period("jan 2020 - dec 2021")
    assert (s, e) == (date(2020, 1, 1), date(2021, 12, 1))
    s, e = N.extract_period("2019 to 2022")
    assert (s, e) == (date(2019, 1, 1), date(2022, 1, 1))
    s, e = N.extract_period("May 2020 – Present")
    assert (s, e) == (date(2020, 5, 1), date(2026, 1, 1))
    s, e = N.extract_period("2021")
    assert s == e == date(2021, 1, 1)


def test_extract_period_prose_degrades_to_year():
    # month word drowned in prose -> year-only resolution (documented quirk)
    s, e = N.extract_period("software engineer, acme (mar 2019 - dec 2020)")
    assert s == date(2019, 1, 1)
    assert e == date(2020, 12, 1)
