"""Excel workbook source: header inference + sheet wrangling.

Parity: ``read_and_wrangle_wb`` (queens/core/read_write.py:12-92).
Spreadsheets are inherently driver-sized, ordered artifacts — Spark
has no distributed xlsx reader, and pretending otherwise would just
hide a driver bottleneck. So this module is honest driver-side code:
it produces pandas frames (with source order captured) that the ETL
layer converts to Spark DataFrames for all real processing.

The byte-level xlsx parse is pluggable: :func:`read_workbook` uses
pandas/openpyxl when available and otherwise the dependency-free
SpreadsheetML parser (:mod:`queens_spark.sources.xlsx_lite`), so
ingest-from-file works in slim runtimes too; tests and alternate
formats can still inject raw frames directly into
:func:`wrangle_workbook`, mirroring how the reference's own tests
monkeypatch the reader.
"""

from __future__ import annotations

from typing import Mapping

import pandas as pd


def infer_header_row(raw: pd.DataFrame, max_scan: int = 50) -> int:
    """Find the header row: first row whose SECOND cell is non-empty.

    The reference re-parses with increasing ``header=h`` until column B
    stops being "Unnamed" (queens/core/read_write.py:67-79) — on a
    header-less frame that is equivalent to scanning for the first row
    with a value in column index 1 (title/junk rows only fill column A).
    """
    limit = min(len(raw), max_scan)
    for h in range(limit):
        cell = raw.iat[h, 1] if raw.shape[1] > 1 else None
        if cell is not None and not pd.isna(cell) and str(cell).strip() != "":
            return h
    raise ValueError("could not infer a header row (no row has a value in column B)")


def apply_header(
    raw: pd.DataFrame,
    header_row: int,
    has_multi_headers: bool = False,
) -> pd.DataFrame:
    """Promote *header_row* to column names; with ``has_multi_headers``
    the row below is part of a two-row header and is skipped too
    (queens/core/read_write.py:81-86)."""
    start = header_row + (2 if has_multi_headers else 1)
    header = [str(v).strip() if not pd.isna(v) else f"col_{i}"
              for i, v in enumerate(raw.iloc[header_row])]
    out = raw.iloc[start:].reset_index(drop=True)
    out.columns = header
    return out


def wrangle_workbook(
    raw_sheets: Mapping[str, pd.DataFrame],
    has_multi_headers: bool = False,
    sheet_name: str | None = None,
    skip_sheets: list[str] | None = None,
    fixed_header: int | None = None,
) -> dict[str, pd.DataFrame] | pd.DataFrame:
    """Wrangle a workbook's raw (header-less) sheets.

    - 1-column sheets (notes pages) are dropped (queens/core/
      read_write.py:60-63);
    - *skip_sheets* are dropped by name;
    - *sheet_name* selects a single sheet (KeyError when missing,
      matching the reference);
    - *fixed_header* overrides inference.
    """
    skip = set(skip_sheets or ())
    if sheet_name is not None:
        if sheet_name not in raw_sheets:
            raise KeyError(f"sheet '{sheet_name}' not found in workbook")
        items = {sheet_name: raw_sheets[sheet_name]}
    else:
        items = dict(raw_sheets)

    out: dict[str, pd.DataFrame] = {}
    for name, raw in items.items():
        if name in skip:
            continue
        if raw.shape[1] <= 1:
            continue
        h = fixed_header if fixed_header is not None else infer_header_row(raw)
        out[name] = apply_header(raw, h, has_multi_headers)
    if sheet_name is not None:
        return out[sheet_name]
    return out


def read_workbook(file_path: str) -> dict[str, pd.DataFrame]:
    """Load every sheet of an xlsx file as raw (header-less) frames.

    Uses pandas/openpyxl when installed (richer format coverage:
    dates, styles-dependent types); otherwise falls back to the
    dependency-free SpreadsheetML parser in
    :mod:`queens_spark.sources.xlsx_lite`, so xlsx ingest works in
    slim runtimes too."""
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        from queens_spark.sources.xlsx_lite import read_workbook_xlsx

        return read_workbook_xlsx(file_path)
    return pd.read_excel(file_path, sheet_name=None, header=None)


def read_and_wrangle_wb(
    file_path: str,
    has_multi_headers: bool = False,
    sheet_name: str | None = None,
    skip_sheets: list[str] | None = None,
    fixed_header: int | None = None,
) -> dict[str, pd.DataFrame] | pd.DataFrame:
    """Reference-shaped entry point: read + wrangle in one call."""
    return wrangle_workbook(
        read_workbook(file_path),
        has_multi_headers=has_multi_headers,
        sheet_name=sheet_name,
        skip_sheets=skip_sheets,
        fixed_header=fixed_header,
    )
