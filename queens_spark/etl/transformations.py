"""Sheet→long-format transformers: the declarative operator registry
that turns wrangled spreadsheet frames into validated long fact tables.

Parity (file:line into /root/reference/):
- process_sheet_to_frame        queens/etl/transformations.py:189-303
- process_multi_sheets_to_frame queens/etl/transformations.py:306-439
- _is_data_sheet                queens/etl/transformations.py:171-186
- sheet-key normalisation       queens/etl/transformations.py:99-113
- registry dispatch (f/f_args)  queens/etl/process.py:57-63 +
                                queens/core/utils.py:107-130

Split of responsibilities (Spark-first): the tiny, inherently ordered
spreadsheet mechanics (transpose, header fixes) happen on the driver
in pandas; everything per-row (melt, template join, cleaning, typing)
is genuine Spark DataFrame code via operators/reshape.py, so the same
operators run unchanged over arbitrarily large inputs.
"""

from __future__ import annotations

import inspect
import re
from typing import Callable, Mapping

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from queens_spark.operators.reshape import (
    SOURCE_ORDER,
    attach_template,
    attach_template_modular,
    clean_string_columns,
    melt,
    transpose_pandas,
    union_frames,
)


def is_data_sheet(name: str, regex: str | None = None) -> bool:
    """Keep numeric sheet names, or those matching the configured
    regex; invalid regex → ValueError (mirrors reference tests)."""
    if str(name).isnumeric():
        return True
    if regex is None:
        return False
    try:
        return re.fullmatch(regex, str(name)) is not None
    except re.error as exc:
        raise ValueError(f"invalid sheet regex {regex!r}: {exc}") from None


def normalize_sheet_key(key: str) -> str:
    """``"4.4a"`` → ``"4.4.A"``: trailing letter suffix uppercased and
    dot-separated (queens/etl/transformations.py:99-113)."""
    m = re.fullmatch(r"(\d+(?:\.\d+)*)([a-z]+)", str(key))
    if not m:
        return str(key)
    return f"{m.group(1)}.{m.group(2).upper()}"


def to_spark_ordered(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """pandas → Spark with the source row order captured as a column
    (Spark rows have no implicit order; SURVEY.md §7.4.1)."""
    pdf = pdf.copy()
    pdf.columns = [str(c) for c in pdf.columns]
    pdf[SOURCE_ORDER] = range(len(pdf))
    # all-object columns keep createDataFrame from failing on mixed
    # spreadsheet cells; schema coercion re-types downstream
    for c in pdf.columns:
        if c != SOURCE_ORDER:
            pdf[c] = pdf[c].map(lambda v: None if pd.isna(v) else str(v))
    return spark.createDataFrame(pdf)


# ----------------------------------------------------- single sheet

def process_sheet(
    spark: SparkSession,
    sheet: pd.DataFrame,
    *,
    template: DataFrame | None = None,
    var_to_melt: str = "year",
    transpose_first: bool = False,
    drop_cols: list[str] | None = None,
    ignore_mapping: bool = False,
    id_var_position: int = 0,
    id_var_name: str = "label",
    unit: str | None = None,
) -> DataFrame:
    """One wrangled sheet → long format.

    Template path (queens/etl/transformations.py:241-303): drop junk
    columns, generate the row ordinal, broadcast-join the mapping
    template (supplies label + dimensions), melt year columns, clean
    note tags.

    Manual path (``ignore_mapping=True``, :239-275): rebuild the id
    vars from the sheet itself (column at *id_var_position* becomes
    *id_var_name* and ``label``), attach constant ``unit``.
    """
    pdf = sheet.copy()
    if transpose_first:
        pdf = transpose_pandas(pdf, index_col=str(pdf.columns[0]))
        pdf.columns = [str(c) for c in pdf.columns]
    if drop_cols:
        pdf = pdf.drop(columns=[c for c in drop_cols if c in pdf.columns])

    if ignore_mapping:
        id_col = str(pdf.columns[id_var_position])
        df = to_spark_ordered(spark, pdf)
        df = df.withColumn("row", F.col(SOURCE_ORDER).cast("long"))
        if id_var_name == "label":
            if id_col != "label":
                df = df.withColumnRenamed(id_col, "label")
            id_vars = ["row", "label"]
        else:
            df = df.withColumn("label", F.col(id_col))
            if id_col != id_var_name:
                df = df.withColumnRenamed(id_col, id_var_name)
            id_vars = ["row", "label", id_var_name]
        if unit is not None:
            df = df.withColumn("unit", F.lit(unit))
            id_vars.append("unit")
        long = melt(
            df.drop(SOURCE_ORDER),
            id_vars=id_vars,
            var_name=var_to_melt.lower(),
            value_name="value",
        )
    else:
        if template is None:
            raise ValueError("template path requires a template DataFrame")
        # first data column is re-supplied by the template's label
        first_col = str(pdf.columns[0])
        df = to_spark_ordered(spark, pdf.drop(columns=[first_col]))
        df = df.withColumn("row", F.col(SOURCE_ORDER).cast("long")).drop(SOURCE_ORDER)
        joined = attach_template(df, template, row_col="row")
        id_vars = [c for c in template.columns]
        long = melt(
            joined,
            id_vars=id_vars,
            var_name=var_to_melt.lower(),
            value_name="value",
        )
    return clean_string_columns(long, exclude=("label",))


# ------------------------------------------------------ multi sheet

def process_multi_sheets(
    spark: SparkSession,
    sheets: Mapping[str, pd.DataFrame],
    *,
    var_on_sheets: str = "year",
    sheet_regex: str | None = None,
    normalize_keys: bool = False,
    **sheet_kwargs,
) -> DataFrame:
    """Workbooks where each data sheet is one slice (year/sector):
    process every data sheet, stamp the sheet name as a column, union
    (queens/etl/transformations.py:306-439)."""
    frames = []
    for name, pdf in sheets.items():
        if not is_data_sheet(name, sheet_regex):
            continue
        key = normalize_sheet_key(name) if normalize_keys else str(name)
        one = process_sheet(spark, pdf, **sheet_kwargs)
        frames.append(one.withColumn(var_on_sheets, F.lit(key)))
    if not frames:
        raise ValueError("no data sheets matched")
    return union_frames(frames)


# ------------------------------------------------------- stacked sheet

def process_stacked_sheet(
    spark: SparkSession,
    sheet: pd.DataFrame,
    template: DataFrame,
    n_template_rows: int,
    *,
    var_to_melt: str = "year",
    drop_cols: list[str] | None = None,
) -> DataFrame:
    """Sheets holding several copies of the same sub-table stacked
    vertically (DUKES 5.6 annual summaries): align each copy to the
    template with row_raw % len(template)
    (queens/etl/transformations.py:512-548)."""
    pdf = sheet.copy()
    if drop_cols:
        pdf = pdf.drop(columns=[c for c in drop_cols if c in pdf.columns])
    first_col = str(pdf.columns[0])
    df = to_spark_ordered(spark, pdf.drop(columns=[first_col]))
    df = df.withColumn("row_raw", F.col(SOURCE_ORDER).cast("long")).drop(SOURCE_ORDER)
    joined = attach_template_modular(df, template, n_template_rows,
                                     raw_row_col="row_raw")
    id_vars = [c for c in template.columns] + ["row_raw"]
    long = melt(joined, id_vars=id_vars, var_name=var_to_melt.lower(),
                value_name="value")
    return clean_string_columns(long.drop("row_raw"), exclude=("label",))


# ------------------------------------------- DUKES special processors

def process_dukes_5_6_summaries(
    spark: SparkSession,
    sheet: pd.DataFrame,
    template: DataFrame,
    n_template_rows: int,
    *,
    table_tag: str = "5.6.J",
    drop_cols: list[str] | None = None,
) -> DataFrame:
    """The DUKES 5.6 "Annual summaries" sheet: several yearly copies of
    one sub-table stacked vertically, with each copy's reference year
    stored OUTSIDE the table in an interim title row
    (queens/etl/transformations.py:455-551).

    Semantics re-expressed Spark-first:

    - the first copy's year comes from the sheet title (the original
      header row, text between *table_tag* and "summary");
    - title rows inside the data carry the later years: extract with
      ``substring_index`` (F5), forward-fill down source order with the
      W1 window, backstop with the title year;
    - header/title rows are dropped, surviving rows get a fresh ordinal
      (W2) which aligns each copy to the mapping template via
      ``row_raw % n_template_rows`` (J3 broadcast join);
    - remaining wide fuel columns melt to long (R1) and note tags are
      cleaned (F1).
    """
    pdf = sheet.copy()
    title = str(pdf.columns[0])
    first_year = title.split(table_tag)[1].split("summary")[0].strip()
    # re-header: the original first data row holds the real column
    # names (the reference re-reads the sheet with fixed_header+1)
    pdf.columns = [str(v) for v in pdf.iloc[0]]
    pdf = pdf.iloc[1:].reset_index(drop=True)
    label_col = str(pdf.columns[0])  # "Generator type"
    if drop_cols is None:
        drop_cols = ["Indicator"]
    pdf = pdf.drop(columns=[c for c in drop_cols if c in pdf.columns])

    df = to_spark_ordered(spark, pdf)
    lab = F.col(label_col)
    year_raw = F.when(
        lab.contains("Table"),
        F.trim(
            F.substring_index(
                F.substring_index(lab, table_tag, -1), "summary", 1
            )
        ),
    )
    df = df.withColumn("__year_raw", year_raw)
    from queens_spark.operators.reshape import ffill as _ffill

    df = _ffill(df, "__year_raw", order_by=[SOURCE_ORDER], out_col="__year")
    df = df.withColumn("year", F.coalesce(F.col("__year"), F.lit(first_year)))
    df = df.where(
        ~lab.contains("Generator type") & ~lab.contains("Table")
    ).drop("__year_raw", "__year")
    # fresh ordinal over the SURVIVING rows (the reference resets the
    # index post-filter), which is what the modular key aligns on
    from pyspark.sql import Window

    df = df.withColumn(
        "row_raw",
        F.row_number().over(Window.orderBy(SOURCE_ORDER)).cast("long") - 1,
    ).drop(SOURCE_ORDER, label_col)
    joined = attach_template_modular(df, template, n_template_rows,
                                     raw_row_col="row_raw")
    joined = joined.drop("row").withColumnRenamed("row_raw", "row")
    id_vars = ["row", "year"] + [c for c in template.columns if c != "row"]
    long = melt(joined, id_vars=id_vars, var_name="fuel", value_name="value")
    return clean_string_columns(long, exclude=("label",))


def process_dukes_5_6(
    spark: SparkSession,
    sheets: Mapping[str, pd.DataFrame],
    templates: Mapping[str, DataFrame],
    n_summary_template_rows: int,
) -> dict[str, DataFrame]:
    """DUKES 5.6 → three logical tables from three differently-shaped
    sheets (queens/etl/transformations.py:553-606): two standard
    template sheets plus the stacked annual summaries."""
    d1 = process_sheet(
        spark, sheets["5.6"],
        template=templates["5.6"], drop_cols=["Fuel"],
    )
    d2 = process_sheet(
        spark, sheets["5.6 Conventional thermal & CCGT"],
        template=templates["5.6 Conventional thermal & CCGT"],
        drop_cols=["Generator category"],
    )
    t3 = process_dukes_5_6_summaries(
        spark, sheets["5.6 Annual summaries"],
        templates["5.6 Annual summaries"], n_summary_template_rows,
    )
    return {"5.6.A_G": d1, "5.6.H_I": d2, "5.6.J": t3}


def process_dukes_5_10(
    spark: SparkSession,
    sheets: Mapping[str, pd.DataFrame],
    templates: Mapping[str, DataFrame],
) -> dict[str, DataFrame]:
    """DUKES 5.10 → two logical tables
    (queens/etl/transformations.py:609-631)."""
    d1 = process_sheet(
        spark, sheets["5.10.A"],
        template=templates["5.10.A"], drop_cols=["Region"],
    )
    d2 = process_sheet(
        spark, sheets["5.10.B and 5.10.C"],
        template=templates["5.10.B and 5.10.C"],
    )
    return {"5.10.A": d1, "5.10.B_C": d2}


# -------------------------------------------------------- registry

TRANSFORMERS: dict[str, Callable] = {
    "process_sheet": process_sheet,
    "process_multi_sheets": process_multi_sheets,
    "process_stacked_sheet": process_stacked_sheet,
    "process_dukes_5_6": process_dukes_5_6,
    "process_dukes_5_10": process_dukes_5_10,
    # reference-config aliases (etl_config.json "f" names)
    "process_sheet_to_frame": process_sheet,
    "process_multi_sheets_to_frame": process_multi_sheets,
}


def call_transformer(name: str, /, **kwargs):
    """Dispatch a registry transformer with kwargs filtered to its
    signature — unknown keys are ignored, required-but-missing raise
    (≙ call_func, queens/core/utils.py:107-130)."""
    fn = TRANSFORMERS[name]
    sig = inspect.signature(fn)
    accepts_var_kw = any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values()
    )
    if accepts_var_kw:
        return fn(**kwargs)
    supported = {k: v for k, v in kwargs.items() if k in sig.parameters}
    return fn(**supported)
