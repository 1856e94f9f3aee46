"""Reshaping operators — the heart of the reference ETL (SURVEY.md §2.8),
re-expressed as Spark DataFrame transforms.

Parity map (file:line into /root/reference/):
- R1 melt:            queens/etl/transformations.py:299-302 → native unpivot
- R2 transpose:       queens/etl/transformations.py:252-256 → driver-side
                      (inherently ordered, sheet-sized data; isolated here
                      so the distributed path stays pure)
- R3 sheet→column:    queens/etl/transformations.py:434-435 → lit column
- R5 id-var rebuild:  queens/etl/transformations.py:258-275 → withColumns
- R6 column drops:    queens/etl/transformations.py:245-248 → drop
- W1 ffill:           queens/etl/transformations.py:492-503 → last ignorenulls
- W2 row ordinal:     queens/etl/transformations.py:263,403 → row_number
- J1/J2 template join: queens/etl/transformations.py:283-293 → broadcast join
- J3 modular join:    queens/etl/transformations.py:519-528 → % + broadcast
- F1 note-tag clean:  queens/core/utils.py:133-149 → regexp_replace
- U1 sheet union:     queens/etl/transformations.py:438 → unionByName
"""

from __future__ import annotations

from functools import reduce
from typing import Iterable

from pyspark.sql import Column, DataFrame, Window, functions as F

NOTE_TAG_PATTERN = r"(?i)\[\s*note\s+\d+\s*\]"

#: Column that carries source-sheet row order through the distributed
#: plan. Spark gives rows no implicit order; the Excel reader stamps
#: this at createDataFrame time (SURVEY.md §7.4.1).
SOURCE_ORDER = "__source_order"


# ----------------------------------------------------------- R1: melt

def melt(
    df: DataFrame,
    id_vars: list[str],
    value_vars: list[str] | None = None,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide→long unpivot. Narrow, zero-shuffle transform: each input
    row yields len(value_vars) output rows within the same partition."""
    if value_vars is None:
        value_vars = [c for c in df.columns if c not in id_vars]
    # unpivot requires homogeneous value types: align to string and let
    # schema coercion re-type afterwards (matches the reference, where
    # melted cells arrive as objects and validation coerces).
    aligned = df
    for c in value_vars:
        aligned = aligned.withColumn(c, F.col(c).cast("string"))
    return aligned.unpivot(id_vars, value_vars, var_name, value_name)


# ------------------------------------------------------ R2: transpose

def transpose_pandas(pdf, index_col: str):
    """Driver-side transpose of a sheet-sized pandas frame (the time
    axis runs down rows in ~10 configured DUKES tables). Deliberately
    NOT distributed: transpose needs total column order, and the
    inputs are spreadsheet-sized by construction. Returns pandas."""
    out = pdf.set_index(index_col).T.reset_index(names=index_col)
    out.columns.name = None
    return out


# ------------------------------------------- W2: deterministic ordinal

def with_row_ordinal(
    df: DataFrame,
    name: str = "row",
    order_by: list[str] | None = None,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """0-based source-order row id. Orders by SOURCE_ORDER when present
    (captured at read time) else by *order_by*."""
    cols = order_by or ([SOURCE_ORDER] if SOURCE_ORDER in df.columns else None)
    if not cols:
        raise ValueError("row ordinal needs SOURCE_ORDER or explicit order_by")
    w = Window.orderBy(*cols)
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*cols)
    return df.withColumn(name, (F.row_number().over(w) - 1).cast("long"))


# --------------------------------------------- J1/J2: template attach

def attach_template(
    data: DataFrame, template: DataFrame, row_col: str = "row"
) -> DataFrame:
    """Inner equi-join of sheet data onto its mapping template by row
    ordinal. Templates are tiny dimension tables → always broadcast
    (zero shuffle of the data side)."""
    return data.join(F.broadcast(template), on=row_col, how="inner")


def attach_template_modular(
    data: DataFrame,
    template: DataFrame,
    n_template_rows: int,
    raw_row_col: str = "row_raw",
    row_col: str = "row",
) -> DataFrame:
    """J3: align repeated sub-tables stacked in one sheet to one
    template via row_mod = row_raw % len(template)."""
    keyed = data.withColumn(
        "__row_mod", (F.col(raw_row_col) % F.lit(n_template_rows)).cast("long")
    )
    return keyed.join(
        F.broadcast(template),
        keyed["__row_mod"] == template[row_col],
        "inner",
    ).drop("__row_mod")


# ------------------------------------------------------- W1: fill down

def ffill(
    df: DataFrame,
    col: str,
    order_by: list[str],
    partition_by: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Forward-fill nulls in source order (last non-null seen)."""
    w = (
        (Window.partitionBy(*partition_by) if partition_by else Window.partitionBy())
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col or col, F.last(F.col(col), ignorenulls=True).over(w)
    )


# ------------------------------------------------- F1: note-tag clean

def clean_note_tags(value: Column | str) -> Column:
    """Remove ``[note N]`` tags (case/whitespace-insensitive) + trim."""
    c = F.col(value) if isinstance(value, str) else value
    return F.trim(F.regexp_replace(c, NOTE_TAG_PATTERN, ""))


def clean_string_columns(df: DataFrame, exclude: Iterable[str] = ("label",)) -> DataFrame:
    """Apply the note-tag cleaner to every string column except
    *exclude* — the reference applies it to every object column except
    ``label`` after every transform (queens/etl/transformations.py:116-129)."""
    exclude = set(exclude)
    cols = []
    for f in df.schema.fields:
        if f.dataType.typeName() == "string" and f.name not in exclude:
            cols.append(clean_note_tags(f.name).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


# ------------------------------------------------------ U1: sheet union

def union_frames(frames: list[DataFrame]) -> DataFrame:
    """UNION ALL by name with missing columns null-filled."""
    if not frames:
        raise ValueError("no frames to union")
    return reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), frames
    )


# ----------------------------------------------- F3/F4: paren splitting

def split_trailing_parens(value: Column | str) -> tuple[Column, Column]:
    """'Fuel name (unit)' → (fuel, unit). Returns (before, inside)."""
    c = F.col(value) if isinstance(value, str) else value
    before = F.trim(F.regexp_replace(c, r"\(.*$", ""))
    inside = F.regexp_extract(c, r"\(([^)]*)\)\s*$", 1)
    return before, inside
