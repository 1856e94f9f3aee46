#!/usr/bin/env python
"""Local replica of the driver's t2 correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at
sf0.01, compare row count + column set + order-insensitive values.

Usage: python scripts/check_correctness.py [name-substring ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("float64") if s.isna().any() else s.astype("int64")
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    problems = []
    if len(a) != len(b):
        problems.append(f"row count {len(a)} vs {len(b)}")
    if sorted(a.columns) != sorted(b.columns):
        problems.append(f"columns {sorted(a.columns)} vs {sorted(b.columns)}")
        return problems
    if problems:
        return problems
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        sa, sb = a[c], b[c]
        if pd.api.types.is_float_dtype(sa) or pd.api.types.is_float_dtype(sb):
            sa = pd.to_numeric(sa, errors="coerce")
            sb = pd.to_numeric(sb, errors="coerce")
            bad = ~(
                (sa.isna() & sb.isna())
                | (
                    (sa - sb).abs()
                    <= 1e-9 * (1 + sa.abs().combine(sb.abs(), max))
                )
            )
        else:
            bad = ~((sa.isna() & sb.isna()) | (sa == sb))
        n_bad = int(bad.sum())
        if n_bad:
            i = bad.idxmax()
            problems.append(
                f"col '{c}': {n_bad} mismatches, first at row {i}: "
                f"spark={a[c][i]!r} oracle={b[c][i]!r}"
            )
    return problems


def main() -> int:
    import __spark_entry__ as entrymod
    from queens_spark.session import get_spark

    patterns = sys.argv[1:]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if patterns:
        qs = {k: v for k, v in qs.items() if any(p in k for p in patterns)}

    spark = get_spark("correctness_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_pass = n_fail = n_weak = 0
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark error: {exc}")
            n_fail += 1
            continue
        finally:
            # dedup/minhash pipelines persist intermediates; keep
            # executor storage flat across the 50-query sweep.
            spark.catalog.clearCache()
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"weak {name}: rows-only, {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            odf = con.execute(oracles[name]).df()
        except Exception as exc:
            print(f"FAIL {name}: oracle error: {exc}")
            n_fail += 1
            continue
        problems = compare(sdf, odf)
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
