"""Fuzzy scorer family — sanity of the rapidfuzz-equivalent decisions."""

from document_parser_private_ray.functions import fuzzy


def test_ratio_basics():
    assert fuzzy.ratio("abc", "abc") == 100.0
    assert fuzzy.ratio("", "") == 100.0
    assert fuzzy.ratio("abc", "") == 0.0
    assert round(fuzzy.ratio("abcd", "abce"), 1) == 75.0  # 2*3/8


def test_token_set_subset_is_perfect():
    # shared-token join makes a subset score 100 (token_set definition)
    assert fuzzy.token_set_ratio("python programming", "python") == 100.0


def test_partial_ratio_substring():
    assert fuzzy.partial_ratio("spark", "apache spark cluster") == 100.0


def test_wratio_typo_above_threshold():
    assert fuzzy.wratio("Pythn", "Python") >= 80
    assert fuzzy.wratio("Javascrpt", "Javascript") >= 80
    assert fuzzy.wratio("Kubernets", "Kubernetes") >= 85


def test_wratio_unrelated_below_threshold():
    assert fuzzy.wratio("Quantum Basket Weaving", "Python") < 60


def test_extract_one_order_and_cutoff():
    choices = ["Python", "Java", "JavaScript"]
    m = fuzzy.extract_one("Pythn", choices, score_cutoff=80)
    assert m is not None and m[0] == "Python"
    assert fuzzy.extract_one("zzzz", choices, score_cutoff=80) is None
    # ties break to the earliest choice (process.extractOne semantics)
    m = fuzzy.extract_one("Java", ["Java", "Java"], score_cutoff=80)
    assert m[2] == 0
