"""Ingest/stage orchestration: config-driven pipeline from workbook
to versioned warehouse tables.

Parity: queens/etl/process.py:12-197 (ingest_tables/stage_data) and
queens/etl/validation.py:11-64 (runtime config resolution). The flow:

    etl_config[collection][chapter][table] = {"f": name, "f_args": {...}}
      → resolve workbook (scraper or local path) + template
      → registry transformer (etl/transformations.py) → long frames
      → schema coercion/validation → warehouse.ingest_frame (versioned)
      → warehouse.stage (snapshot + metadata)

Config files are plain JSON in the reference's etl_config.json shape,
so an existing QUEENS catalog drives this engine unchanged.
"""

from __future__ import annotations

import json
import re
from typing import Any, Mapping

import pandas as pd
from pyspark.sql import DataFrame

from queens_spark.core.errors import UnknownColumnError
from queens_spark.etl.transformations import call_transformer
from queens_spark.facade import Engine
from queens_spark.sources.excel import read_workbook, wrangle_workbook


def table_to_chapter(table: str, collection: str = "dukes") -> str:
    """Map a logical table id to its chapter key: "1.2.3" → "chapter_1";
    letter tables (I.1, J.1 …) map via their letter's chapter
    (queens/core/utils.py:30-55)."""
    m = re.match(r"^(\d+)", str(table))
    if m:
        return f"chapter_{m.group(1)}"
    letter = str(table)[0].upper()
    letter_chapters = {"I": "chapter_5", "J": "chapter_5",
                       "E": "chapter_6", "F": "chapter_6"}
    if letter in letter_chapters:
        return letter_chapters[letter]
    raise UnknownColumnError(f"cannot resolve chapter for table '{table}'")


def load_etl_config(path: str) -> dict:
    with open(path) as fh:
        return json.load(fh)


def resolve_table_config(
    etl_config: Mapping[str, Any],
    collection: str,
    table: str,
) -> dict:
    """Find the table's transformer config inside its chapter
    (queens/etl/validation.py:11-64, minus the network scrape which is
    injected by the caller)."""
    if collection not in etl_config:
        raise UnknownColumnError(f"unknown data collection '{collection}'")
    chapter = table_to_chapter(table, collection)
    chapters = etl_config[collection]
    if chapter not in chapters or table not in chapters[chapter]:
        raise UnknownColumnError(
            f"table '{table}' is not configured for '{collection}'"
        )
    cfg = dict(chapters[chapter][table])
    cfg.setdefault("f_args", {})
    return cfg


def ingest_table(
    engine: Engine,
    collection: str,
    table: str,
    *,
    raw_sheets: Mapping[str, pd.DataFrame] | None = None,
    workbook_path: str | None = None,
    etl_config: Mapping[str, Any],
    templates: Mapping[str, DataFrame] | None = None,
    url: str | None = None,
    table_description: str | None = None,
    ingest_ts=None,
) -> dict[str, int]:
    """Ingest one configured table. Returns {logical_table: ingest_id}.

    The workbook arrives either as *raw_sheets* (pre-parsed, e.g. from
    a scraper download or a test fixture) or as *workbook_path*. One
    configured table may yield several logical tables (a transformer
    can return a dict of frames — DUKES 5.6 → 3 tables).
    """
    cfg = resolve_table_config(etl_config, collection, table)
    f_name = cfg["f"]
    f_args = dict(cfg.get("f_args", {}))

    if raw_sheets is None:
        if workbook_path is None:
            raise ValueError("need raw_sheets or workbook_path")
        raw_sheets = read_workbook(workbook_path)

    wrangle_keys = ("has_multi_headers", "sheet_name", "skip_sheets", "fixed_header")
    wrangled = wrangle_workbook(
        raw_sheets, **{k: f_args.pop(k) for k in wrangle_keys if k in f_args}
    )
    if isinstance(wrangled, pd.DataFrame):
        f_args.setdefault("sheet", wrangled)
    else:
        f_args.setdefault("sheets", wrangled)
        if "sheet" in f_args and isinstance(f_args["sheet"], str):
            f_args["sheet"] = wrangled[f_args["sheet"]]
    if templates and table in templates:
        f_args.setdefault("template", templates[table])
    if templates:
        # multi-sheet special processors (DUKES 5.6/5.10) pick their
        # per-sheet templates out of the full mapping themselves
        f_args.setdefault("templates", templates)

    result = call_transformer(f_name, spark=engine.spark, **f_args)
    frames = result if isinstance(result, dict) else {table: result}

    out = {}
    for logical_table, frame in frames.items():
        out[logical_table] = engine.ingest(
            frame,
            collection,
            logical_table,
            url=url,
            table_description=table_description or cfg.get("description"),
            ingest_ts=ingest_ts,
        )
    return out


def ingest_tables(
    engine: Engine,
    collection: str,
    tables: list[str],
    *,
    workbooks: Mapping[str, Mapping[str, pd.DataFrame]],
    etl_config: Mapping[str, Any],
    templates: Mapping[str, DataFrame] | None = None,
    ingest_ts=None,
) -> dict[str, dict[str, int]]:
    """Batch ingest (≙ queens/etl/process.py:12-95). *workbooks* maps
    table id → raw sheets."""
    results = {}
    for table in tables:
        results[table] = ingest_table(
            engine, collection, table,
            raw_sheets=workbooks[table],
            etl_config=etl_config,
            templates=templates,
            ingest_ts=ingest_ts,
        )
    return results


def configured_tables(etl_config: Mapping[str, Any], collection: str) -> list[str]:
    """Every table id configured for *collection*, in chapter order."""
    if collection not in etl_config:
        raise UnknownColumnError(f"unknown data collection '{collection}'")
    return [t for chapter in etl_config[collection].values() for t in chapter]


def ingest_all_tables(
    engine: Engine,
    collection: str,
    *,
    workbooks: Mapping[str, Mapping[str, pd.DataFrame]],
    etl_config: Mapping[str, Any],
    templates: Mapping[str, DataFrame] | None = None,
    ingest_ts=None,
) -> dict[str, dict[str, int]]:
    """Ingest EVERY configured table of the collection
    (≙ ingest_all_tables, queens/etl/process.py:98-136). Tables without
    a supplied workbook are skipped with their absence reported via the
    returned dict (the reference logs-and-continues per table)."""
    tables = [t for t in configured_tables(etl_config, collection)
              if t in workbooks]
    return ingest_tables(
        engine, collection, tables,
        workbooks=workbooks, etl_config=etl_config,
        templates=templates, ingest_ts=ingest_ts,
    )


def stage_data(engine: Engine, collection: str, as_of=None) -> list[str]:
    """Materialise the prod snapshot (≙ queens/etl/process.py:139-197)."""
    return engine.stage(collection, as_of=as_of)
