"""Engine configuration: section-detection regex banks, cleaning and
abbreviation pattern groups, and PII rules.

These defaults re-express the reference's user-editable YAML surface
(SURVEY.md §2.7: /root/reference/config/parsing_rules.yaml,
patterns.yaml, pii_config.yaml) as Python constants — frozen at import,
shipped to every worker by value (broadcast-small-side by construction).
User overrides: pass a dict of the same shape (optionally loaded from
YAML via ``load_yaml_config``) into the stage constructors.

Ordering is part of the contract (SURVEY §4.3): section *iteration
order* decides first-match-wins in heading classification, and pattern
files keep their insertion order.
"""

from __future__ import annotations

from typing import Dict, List, Optional

#: The fixed 7-section vocabulary, in match-priority order
#: (section_detector.py:32-40).
SECTION_NAMES = (
    "contact",
    "summary",
    "skills",
    "education",
    "experience",
    "projects",
    "certifications",
)

#: Per-section detection regex banks (parsing_rules.yaml
#: detection_rules.patterns.sections.*.patterns semantics). Patterns are
#: applied with ``re.search`` + IGNORECASE to each stripped line; any hit
#: assigns the line to that section; sections are tried in
#: ``SECTION_NAMES`` order.
SECTION_PATTERNS: Dict[str, List[str]] = {
    "contact": [
        r"contact\s*information",
        r"personal\s*details",
        r"^\d{3}[-\s]?\d{3}[-\s]?\d{4}",  # bare phone line
        r"^[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}$",  # bare email line
        r"^linkedin\.com/in/[\w-]+$",
        r"^github\.com/[\w-]+$",
    ],
    "summary": [
        r"^summary$",
        r"professional\s+summary",
        r"profile",
        r"objective",
        r"about\s+me",
        r"career\s+objective",
    ],
    "skills": [
        r"^skills$",
        r"^technical\s+skills$",
        r"technical\s+skills",
        r"skills(\s+&\s+competencies)?",
        r"technologies(\s+used)?",
        r"tools\s+&\s+technologies",
        r"core\s+competencies",
        r"expertise",
        r"^languages:",
        r"^frameworks\s+&\s+libraries:",
        r"^tools\s+&\s+ci/cd:",
        r"^testing:",
        r"^software\s+design\s+&\s+architecture:",
        r"^agile\s+methodologies:",
        r"^programming\s+languages$",
        r"^frameworks$",
        r"^tools$",
        r"^databases$",
        r"^methodologies$",
    ],
    "education": [
        r"^education$",
        r"education(\s+background)?",
        r"academic(\s+background)?",
        r"qualifications",
        r"academic\s+history",
        r"educational\s+qualifications",
        r"bachelor\s+of\s+science",
        r"national\s+certificate",
        r"^wethinkcode",
        r"^university\s+of",
        r"^college",
        r"^institute",
    ],
    "experience": [
        r"experience",
        r"work\s+experience",
        r"professional\s+experience",
        r"employment\s+history",
        r"career\s+history",
        r"work\s+history",
        r"job history",
        r"career summary",
        r"professional background",
        r"positions held",
        # job-title shaped lines open an experience entry
        r"[A-Z][a-z]+\s+[A-Z]?[a-z]*\s*Developer",
        r"[A-Z][a-z]+\s+Developer\s+\([A-Za-z]+\)",
        r"[A-Z][a-z]+\s+Training\s+Developer",
        r"Technical\s+Mentor",
        r"Trainee\s+Software\s+Developer",
        r"[A-Z][a-z]+\s+Engineer",
        r"[A-Z][a-z]+\s+Consultant",
        r"[A-Z][a-z]+\s+Analyst",
        r"[A-Z][a-z]+\s+Manager",
        r"[A-Z][a-z]+\s+Architect",
        r"[A-Z][a-z]+\s+Lead",
    ],
    "projects": [
        r"^projects$",
        r"^technical\s+projects$",
        r"technical\s+projects",
        r"personal\s+projects",
        r"key\s+projects",
        r"portfolio",
        r"^[\w\s-]+\s+-\s+[\w\s]+(?:app|system|platform)$",
        r"^[\w\s-]+\s+-\s+[\w\s]+(?:game)$",
        r"^project\s+\d+:",
        r"^\d+\.\s+[\w\s-]+",
    ],
    "certifications": [
        r"^achievements\s+&\s+certifications",
        r"certifications?",
        r"certificates?",
        r"awards",
        r"honors",
        r"accomplishments",
        r"^hackerrank\s+certifications?:",
        r"^medallion",
    ],
}

#: Skill-normalization pattern group (patterns.yaml skill_patterns).
SKILL_PATTERNS = {
    "category_labels": ["Languages", "Tools", "Frameworks", "Libraries"],
    "stop_words": {
        "and", "or", "with", "using", "in", "on", "for", "to", "of", "the", "a", "an",
    },
}

#: Education-normalization pattern group (patterns.yaml education_patterns).
EDUCATION_PATTERNS = {
    "institution_indicators": ["university", "college", "institute", "school"],
    "degree_indicators": [
        r"bachelor|master|phd|bsc|msc|mba|ba|bs|ms|ma",
        r"b\.?s\.?|m\.?s\.?|ph\.?d\.?|m\.?b\.?a\.?",
    ],
}

#: Experience-normalization pattern group (patterns.yaml
#: experience_patterns + experience_normalization).
EXPERIENCE_PATTERNS = {
    "company_suffixes": [
        r"Inc|Incorporated",
        r"Corp|Corporation",
        r"Co|Company",
        r"Ltd|Limited",
        r"LLC",
        r"Group",
    ],
    # [abbrev_regex, expansion]; compound (whitespace-containing) entries
    # expand first, then single-token entries (experience_normalizer.py:85-96)
    "title_abbreviations": [
        [r"Sr\.?\s*SWE", "Senior Software Engineer"],
        [r"Sr\.?\s*Dev(?:eloper)?", "Senior Developer"],
        [r"Sr\.?\s*Eng(?:ineer)?", "Senior Engineer"],
        [r"Jr\.?\s*SWE", "Junior Software Engineer"],
        [r"Jr\.?\s*Dev(?:eloper)?", "Junior Developer"],
        [r"Jr\.?\s*Eng(?:ineer)?", "Junior Engineer"],
        [r"Tech\s*Lead", "Technical Lead"],
        [r"Sr\.?\s*Tech\s*Lead", "Senior Technical Lead"],
        [r"Sr\.?", "Senior"],
        [r"Jr\.?", "Junior"],
        [r"Mgr\.?", "Manager"],
        [r"Dir\.?", "Director"],
        [r"VP", "Vice President"],
        [r"PM", "Project Manager"],
        [r"SWE", "Software Engineer"],
        [r"SDE", "Software Development Engineer"],
        [r"Dev\.?", "Developer"],
        [r"Eng\.?", "Engineer"],
        [r"Tech\.?", "Technical"],
        [r"Sys\.?", "Systems"],
        [r"Arch\.?", "Architect"],
        [r"Lead", "Lead"],
    ],
    "fuzzy_match": {"company_threshold": 85, "title_threshold": 90},
    "description_cleaning": {
        "bullet_points": r"^[\s•\-*]+",
        "whitespace": r"\s+",
        "artifacts": r"[^\w\s&.,-]",
    },
}

#: PII detection rules (pii_config.yaml detection_rules semantics, with
#: the reference YAML's literal "r'...'" wrapper artifact fixed: patterns
#: here are real regexes).
PII_RULES = {
    "detection_rules": {
        "EMAIL": [r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Z|a-z]{2,}\b"],
        "PHONE": [r"\b(?:\+\d{1,2}\s?)?(?:\(\d{3}\)|\d{3})[-.\s]?\d{3}[-.\s]?\d{4}\b"],
        "SSN": [r"\b\d{3}[-]?\d{2}[-]?\d{4}\b"],
        "ADDRESS": [
            r"\b\d{1,5}\s[\w\s]{1,20}(?:street|st|avenue|ave|road|rd|lane|ln|drive|dr|boulevard|blvd)\b"
        ],
    },
    "replacement_strategy": "hash",
    "hash_salt": "engine_default_salt",
}


def load_yaml_config(path: str) -> Optional[dict]:
    """Load a user YAML override file (extension surface parity)."""
    try:
        import yaml

        with open(path, "r") as f:
            return yaml.safe_load(f)
    except FileNotFoundError:
        return None


def default_config_path(name: str) -> str:
    """Path of a shipped default config file (``parsing_rules.yaml``,
    ``patterns.yaml``, ``pii_config.yaml``) — the same user-editable
    surface the reference exposes under config/."""
    import os

    return os.path.join(os.path.dirname(__file__), "config", name)


def section_patterns_from_config(cfg: dict) -> Dict[str, List[str]]:
    """parsing_rules.yaml -> the flat {section: [patterns]} dict
    ``SectionDetector`` consumes. Accepts the reference's nested shape
    (section_detector.py:6-29: detection_rules.patterns.sections.
    <name>.patterns) or an already-flat mapping. Section ORDER follows
    file order — it is the match priority."""
    if "detection_rules" in cfg:
        cfg = cfg["detection_rules"]
    patterns = cfg.get("patterns", cfg)
    sections = patterns.get("sections", patterns)
    out: Dict[str, List[str]] = {}
    for name, info in sections.items():
        if isinstance(info, dict):
            out[name] = list(info.get("patterns", []))
        else:
            out[name] = list(info)
    return out


def pii_rules_from_config(cfg: dict) -> dict:
    """pii_config.yaml -> ``PIIAnonymizer`` config. Entity keys
    upper-case; the reference YAML's literal "r'...'" wrapper artifact
    (its pii_config.yaml stores python-source raw-string syntax AS the
    pattern text) is stripped so patterns are real regexes."""
    rules = cfg.get("detection_rules", {})
    cleaned: Dict[str, List[str]] = {}
    for entity, pats in rules.items():
        fixed = []
        for p in pats:
            if isinstance(p, str) and p.startswith("r'") and p.endswith("'"):
                p = p[2:-1]
            fixed.append(p)
        cleaned[entity.upper()] = fixed
    return {
        "detection_rules": cleaned,
        "replacement_strategy": cfg.get(
            "replacement_strategy", PII_RULES["replacement_strategy"]
        ),
        "hash_salt": cfg.get("hash_salt", PII_RULES["hash_salt"]),
    }


def pattern_groups_from_config(cfg: dict) -> dict:
    """patterns.yaml -> the normalizer pattern groups
    (skill/education/experience), converting YAML lists back to the
    in-memory shapes (stop_words set, [regex, expansion] pairs)."""
    out = {}
    if "skill_patterns" in cfg:
        sp = dict(cfg["skill_patterns"])
        if "stop_words" in sp:
            sp["stop_words"] = set(sp["stop_words"])
        out["skill_patterns"] = sp
    if "education_patterns" in cfg:
        out["education_patterns"] = dict(cfg["education_patterns"])
    if "experience_patterns" in cfg:
        ep = dict(cfg["experience_patterns"])
        if "title_abbreviations" in ep:
            ep["title_abbreviations"] = [list(p) for p in ep["title_abbreviations"]]
        out["experience_patterns"] = ep
    return out
