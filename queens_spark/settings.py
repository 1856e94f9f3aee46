"""Engine-wide policies: type system, operator policy, paths.

Parity notes (citations into /root/reference/):
- 4-type scalar system TEXT/INTEGER/REAL/DATETIME: queens/settings.py:58-63.
- Operator policy per type (VALID_OPS): queens/settings.py:65-69.
- Operator → SQL fragment map (OP_SQL): queens/settings.py:71-79; here the
  compilation target is a pyspark Column expression, see core/filters.py.
- Warehouse location: the reference keeps a per-user SQLite file
  (queens/settings.py paths); we keep a parquet warehouse directory.
"""

from __future__ import annotations

import os
from pyspark.sql import types as T

# ---------------------------------------------------------------- types

#: Engine SQL type → Spark type. The reference's closed 4-type world
#: (TEXT/INTEGER/REAL/DATETIME) plus extension types used by the
#: scale operators (arrays of float for embeddings, binary for media).
SPARK_TYPES: dict[str, T.DataType] = {
    "TEXT": T.StringType(),
    "INTEGER": T.LongType(),
    "REAL": T.DoubleType(),
    "DATETIME": T.TimestampType(),
    "ARRAY<FLOAT>": T.ArrayType(T.FloatType()),
    "BINARY": T.BinaryType(),
}

#: Python-side cast used when validating filter values (mirrors DTYPES,
#: queens/settings.py:58-63): filter values arrive as JSON scalars and
#: are coerced to the column's declared type before compilation.
PY_CASTS = {
    "TEXT": str,
    "INTEGER": int,
    "REAL": float,
    "DATETIME": str,  # ISO-8601 string; compared as timestamp
}

# ------------------------------------------------------------ operators

#: Allowed filter operators per engine type (queens/settings.py:65-69).
VALID_OPS: dict[str, set[str]] = {
    "INTEGER": {"eq", "neq", "lt", "lte", "gt", "gte"},
    "REAL": {"eq", "neq", "lt", "lte", "gt", "gte"},
    "DATETIME": {"eq", "neq", "lt", "lte", "gt", "gte"},
    "TEXT": {"eq", "neq", "like"},
}

#: All operators the DSL knows about.
ALL_OPS = frozenset().union(*VALID_OPS.values())

#: Key introducing a disjunction group in the filter DSL.
OR_KEY = "$or"

# ---------------------------------------------------------------- paths

DEFAULT_WAREHOUSE = os.environ.get(
    "QUEENS_SPARK_WAREHOUSE", os.path.expanduser("~/.queens_spark/warehouse")
)

#: Per-user config dir (reference: queens/settings.py:116-127 copies
#: packaged defaults to USER_DIR on first use). Override precedence:
#: $QUEENS_SPARK_CONFIG_DIR > the per-user default; within the dir,
#: a user-edited file always wins over the packaged default.
PACKAGED_CONFIG_DIR = os.path.join(os.path.dirname(__file__), "config")
USER_CONFIG_DIR = os.environ.get(
    "QUEENS_SPARK_CONFIG_DIR", os.path.expanduser("~/.queens_spark/config")
)
CONFIG_FILES = ("etl_config.json", "templates.json", "urls.json")


def ensure_user_configs(user_dir: str | None = None) -> str:
    """Idempotent config bootstrap: copy each packaged default JSON
    (and the templates dir) into the per-user config dir unless the
    user already has one — existing files are never overwritten, so
    user edits take precedence over shipped defaults. Returns the dir.

    Unlike the reference this does NOT run at import time: an explicit
    call keeps `import queens_spark` free of filesystem side effects
    (import-time writes break read-only deployments); the CLI and
    `load_configs` call it on first use instead.
    """
    import shutil

    dest = user_dir or USER_CONFIG_DIR
    os.makedirs(dest, exist_ok=True)
    for name in CONFIG_FILES:
        src = os.path.join(PACKAGED_CONFIG_DIR, name)
        dst = os.path.join(dest, name)
        if os.path.exists(src) and not os.path.exists(dst):
            shutil.copy(src, dst)
    tpl_src = os.path.join(PACKAGED_CONFIG_DIR, "templates")
    tpl_dst = os.path.join(dest, "templates")
    if os.path.isdir(tpl_src) and not os.path.isdir(tpl_dst):
        shutil.copytree(tpl_src, tpl_dst)
    return dest


def load_configs(user_dir: str | None = None) -> dict[str, dict]:
    """The reference's four-config runtime shape: bootstrap the user
    dir, then read etl_config/templates/urls as plain dicts keyed by
    basename-without-extension."""
    import json

    dest = ensure_user_configs(user_dir)
    out = {}
    for name in CONFIG_FILES:
        path = os.path.join(dest, name)
        with open(path) as fh:
            out[name.rsplit(".", 1)[0]] = json.load(fh)
    return out

#: API pagination limits (queens/api/app.py:18-19).
DEFAULT_LIMIT = 1000
MAX_LIMIT = 5000

#: Service columns dropped from query results
#: (queens/api/app.py:174-179, queens/facade.py:161).
SERVICE_COLUMNS = ("ingest_id", "ingest_ts", "table_description")

#: Stable surrogate row id materialised at stage time; replaces the
#: reference's reliance on SQLite's implicit rowid for ordering and
#: cursor pagination (queens/api/app.py:133-147).
ROW_UID = "row_uid"
