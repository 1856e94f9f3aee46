"""Export sinks: staged tables → csv / parquet / xlsx files.

Parity: export_table / export_all (queens/core/read_write.py:96-240).
CSV and Parquet are distributed Spark writes; xlsx is inherently a
driver-side single-file format (written with the dependency-free
SpreadsheetML writer in sources/xlsx_lite.py).
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from queens_spark.facade import Engine, drop_all_null_columns


def _dated_name(collection: str, table_name: str, ts: datetime | None, ext: str) -> str:
    ts = ts or datetime.now(timezone.utc)
    safe_table = str(table_name).replace(".", "_")
    return f"{collection}_{safe_table}_{ts:%Y%m%d}.{ext}"


def export_table(
    engine: Engine,
    collection: str,
    file_type: str,
    table_name: str,
    output_path: str,
    output_ts: datetime | None = None,
) -> str:
    """Export one staged logical table. csv/parquet are written by the
    cluster (a directory of part files — the scalable shape); xlsx
    collects to the driver (sheet-sized by definition)."""
    df = engine.query(collection, table_name, prune_null_columns=True)
    target = os.path.join(
        output_path, _dated_name(collection, table_name, output_ts, file_type)
    )
    if file_type == "csv":
        df.write.mode("overwrite").option("header", True).csv(target)
    elif file_type == "parquet":
        df.write.mode("overwrite").parquet(target)
    elif file_type == "jsonl":
        # sharded JSON-lines — the standard training-data interchange
        # shape; each part file is one shard
        df.write.mode("overwrite").json(target)
    elif file_type == "orc":
        # columnar alternative bundled with Spark (no extra packages);
        # same distributed write shape as parquet
        df.write.mode("overwrite").orc(target)
    elif file_type == "xlsx":
        from queens_spark.sources.xlsx_lite import write_workbook_xlsx

        # driver-side by nature (single-file format, sheet-sized data)
        write_workbook_xlsx(target, {str(table_name): df.toPandas()})
    else:
        raise ValueError(f"unsupported export type '{file_type}'")
    return target


def export_all(
    engine: Engine,
    collection: str,
    file_type: str,
    output_path: str,
    bulk_export: bool = False,
    output_ts: datetime | None = None,
) -> list[str]:
    """Export every staged table; ``bulk_export`` writes one combined
    artifact (single parquet dataset partitioned by table_name, or one
    xlsx with a sheet per table)."""
    tables = [
        r["table_name"]
        for r in engine.warehouse.read_metadata(collection)
        .select("table_name").distinct().orderBy("table_name").collect()
    ]
    if not bulk_export:
        return [
            export_table(engine, collection, file_type, t, output_path, output_ts)
            for t in tables
        ]
    target = os.path.join(
        output_path, _dated_name(collection, "all", output_ts, file_type)
    )
    if file_type in ("parquet", "orc"):
        prod = engine.warehouse.read_prod(collection)
        tdir = engine._pending_takedown_dir(collection)
        if tdir is not None:
            # a retired-but-not-yet-restaged row must not export —
            # the same coverage-scoped filter Engine.query applies
            from queens_spark.store.takedown import apply_takedowns

            prod = apply_takedowns(prod, engine.spark, tdir)
        writer = prod.write.mode("overwrite").partitionBy("table_name")
        getattr(writer, file_type)(target)
    elif file_type == "xlsx":
        from queens_spark.sources.xlsx_lite import write_workbook_xlsx

        write_workbook_xlsx(
            target,
            {
                str(t)[:31]: engine.query(collection, t).toPandas()
                for t in tables
            },
        )
    elif file_type in ("csv", "jsonl"):
        for t in tables:
            export_table(engine, collection, file_type, t, output_path, output_ts)
    else:
        raise ValueError(f"unsupported export type '{file_type}'")
    return [target]
