"""Skill normalizer (T4/N1/N2) — exact, fuzzy, category and list paths
(re-encoded from test_SkillNormalizer.py, threshold 80 = impl default)."""

from document_parser_private_ray.functions.skills import SkillNormalizer

ONTOLOGY = {
    "Python": ["Python3", "Python 3", "Python Programming"],
    "JavaScript": ["JS", "Javascript", "ECMAScript"],
    "Machine Learning": ["ML", "Machine-Learning"],
    "Docker": ["Docker Containers", "Containerization"],
}


def make():
    return SkillNormalizer(ontology=ONTOLOGY)


def test_exact_match_case_insensitive():
    n = make()
    assert n.normalize("python3") == "Python"
    assert n.normalize("PYTHON") == "Python"
    assert n.normalize("js") == "JavaScript"


def test_canonical_passthrough():
    n = make()
    assert n.normalize("Docker") == "Docker"


def test_fuzzy_match():
    n = make()
    assert n.normalize("Pythn") == "Python"
    assert n.normalize("Javascrpt") == "JavaScript"


def test_category_label_and_parenthetical_stripping():
    n = make()
    assert n.normalize("Languages: Python") == "Python"
    assert n.normalize("Python (scripting)") == "Python"


def test_no_match_identity():
    n = make()
    assert n.normalize("Underwater Basket Weaving") == "Underwater Basket Weaving"


def test_edge_inputs():
    n = make()
    assert n.normalize(None) is None
    assert n.normalize("") == ""
    assert n.normalize("   ") == "   "
    assert n.normalize(42) is None


def test_normalize_list_category_split():
    n = make()
    out = n.normalize_list(["Languages: Python, JS"])
    assert out == ["JavaScript", "Python"]


def test_normalize_list_parenthetical_subskills():
    n = make()
    out = n.normalize_list(["Docker (Containerization, ML)"])
    assert set(out) == {"Docker", "Machine Learning"}


def test_normalize_list_filters_stopwords_and_junk():
    n = make()
    out = n.normalize_list(["and", "x", "  ", None, "••", "- Python3"])
    assert out == ["Python"]


def test_normalize_list_sorted_dedup():
    n = make()
    out = n.normalize_list(["Python", "python3", "JS", "Javascript"])
    assert out == ["JavaScript", "Python"]


def test_add_custom_mapping():
    n = make()
    n.add_custom_mapping("Torch", "PyTorch")
    assert n.normalize("Torch") == "PyTorch"
