"""Error taxonomy.

The reference signals validation failures with stock Python exception
classes and maps them to HTTP statuses at the API boundary
(queens/api/app.py:67-124):

- ``KeyError``   — name not in schema / unknown collection → 404/422
- ``NameError``  — column not queryable for this table     → 422
- ``ValueError`` — operator not allowed / bad value        → 422
- ``TypeError``  — value type mismatch (e.g. like non-str) → 422

We keep the same classes (so the error surface is drop-in compatible)
but give the engine named aliases for readability.
"""

UnknownColumnError = KeyError
NotQueryableError = NameError
InvalidOperatorError = ValueError
InvalidValueTypeError = TypeError


class StagingError(RuntimeError):
    """Raised when staging cannot produce a consistent snapshot."""


class SchemaValidationError(ValueError):
    """Raised when an ingest frame violates the declared schema
    (unexpected columns, nullability, duplicate dimension keys) —
    mirrors queens/etl/validation.py:89-147 which raises ValueError."""
