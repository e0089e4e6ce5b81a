"""Arrow schemas for the engine's tables (SURVEY §1.5 mapping).

Input (the ``input_hint`` contract — Lance logical schema, Parquet
physical in this sandbox):
    doc_id: string
    spans:  list<struct<kind, text, media_ref: string, offset: int32>>

Output of the parse chain:
    doc_id, out_spans (north-rule span contract), resume struct
    (schemas/resume_schema.py:5-33 equivalent; dates as ISO strings,
    "" for absent strings, plus additive duration_months).
"""

import pyarrow as pa

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

INPUT_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])

OUT_SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("order", pa.int32()),
    ]
)

CONTACT_TYPE = pa.struct(
    [
        ("name", pa.string()),
        ("email", pa.string()),
        ("phone", pa.string()),
        ("linkedin", pa.string()),
        ("github", pa.string()),
        ("location", pa.string()),
    ]
)

EDUCATION_TYPE = pa.struct(
    [
        ("institution", pa.string()),
        ("degree", pa.string()),
        ("field_of_study", pa.string()),
        ("start_date", pa.string()),
        ("end_date", pa.string()),
        ("description", pa.string()),
        ("achievements", pa.list_(pa.string())),
    ]
)

EXPERIENCE_TYPE = pa.struct(
    [
        ("company", pa.string()),
        ("position", pa.string()),
        ("start_date", pa.string()),
        ("end_date", pa.string()),
        ("description", pa.string()),
        ("technologies", pa.list_(pa.string())),
        ("duration_months", pa.int32()),
    ]
)

PROJECT_TYPE = pa.struct(
    [
        ("name", pa.string()),
        ("description", pa.string()),
        ("technologies", pa.list_(pa.string())),
    ]
)

RESUME_TYPE = pa.struct(
    [
        ("contact", CONTACT_TYPE),
        ("summary", pa.string()),
        ("skills", pa.list_(pa.string())),
        ("education", pa.list_(EDUCATION_TYPE)),
        ("experience", pa.list_(EXPERIENCE_TYPE)),
        ("projects", pa.list_(PROJECT_TYPE)),
        ("certifications", pa.list_(pa.string())),
    ]
)

PII_ENTRY_TYPE = pa.struct(
    [
        ("replacement", pa.string()),
        ("type", pa.string()),
        ("original", pa.string()),
        ("context", pa.string()),
    ]
)

PARSED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("out_spans", pa.list_(OUT_SPAN_TYPE)),
        ("resume", RESUME_TYPE),
        ("error", pa.string()),
    ]
)

PARSED_PII_SCHEMA = pa.schema(
    list(PARSED_SCHEMA)
    + [("anonymized_text", pa.string()), ("pii_map", pa.list_(PII_ENTRY_TYPE))]
)

#: Exploded-span schema (R1 reassembly path)
EXPLODED_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
