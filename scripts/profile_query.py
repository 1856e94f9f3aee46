#!/usr/bin/env python
"""Per-query profiling helper for the optimization rounds.

Usage:
    python scripts/profile_query.py q198 q200          # time + plan
    python scripts/profile_query.py --explain-only q198
    python scripts/profile_query.py --out plans/r14 --suffix before q198

Times each named query with the noop sink (best of N, same methodology
as bench.py) and writes ``<out>/<name>_<suffix>.txt`` with the
``explain("formatted")`` output when --out is given.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+", help="query name substrings")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default=None, help="directory for plan files")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--explain-only", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from queens_spark.queries import QUERIES
    from queens_spark.session import get_spark

    spark = get_spark("queens_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    picked = []
    for pat in args.names:
        hits = [n for n in sorted(QUERIES) if pat in n]
        if not hits:
            print(f"no query matches {pat!r}", file=sys.stderr)
        picked.extend(h for h in hits if h not in picked)

    for name in picked:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if args.out:
            os.makedirs(args.out, exist_ok=True)
            path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(plan)
            print(f"wrote {path}")
        else:
            print(f"===== {name} =====")
            print(plan)
        if args.explain_only:
            continue
        best = None
        times = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"profile:{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            times.append(el)
            best = el if best is None else min(best, el)
            spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        print(f"{name}: best {best:.3f}s  runs {[round(t, 3) for t in times]}")


if __name__ == "__main__":
    main()
