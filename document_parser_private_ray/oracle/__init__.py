from .document import DocumentOracle, OUT_SPAN_FIELDS  # noqa: F401
