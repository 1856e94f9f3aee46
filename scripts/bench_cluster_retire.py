#!/usr/bin/env python
"""Measure cluster-map retirement vs rebuild-on-survivors (SCALE.md).

Builds the same boilerplate-heavy synthetic corpus as
bench_cluster_append.py, retires a 1% takedown set from the stored
map, and times: the coverage-scoped retire (store/cluster_map.py:
retire_cluster_map) vs a from-scratch rebuild of the survivors at the
same frozen max_df — then verifies the two assign identical
components. The template shingles stay hot (a 1% removal cannot cross
the frozen cap at this scale), so this measures the COMMON takedown
path: tombstones + df decrements + affected-component re-CC, no
un-flip scan.

Usage: python scripts/bench_cluster_retire.py [n_docs]   (default 60000)
"""
from __future__ import annotations

import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from pyspark.sql import functions as F

from queens_spark.operators import dedup
from queens_spark.session import get_spark
from queens_spark.store.cluster_map import (
    build_cluster_map,
    retire_cluster_map,
)

BOILER = (
    "all rights reserved contact us terms of service privacy policy "
    "cookie notice subscribe to newsletter follow on social"
)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    spark = get_spark()
    rng = random.Random(11)
    rows = []
    for i in range(1, n_docs + 1):
        body = " ".join(
            f"w{rng.randint(0, 4000)}" for _ in range(rng.randint(20, 60))
        )
        rows.append((i, f"{BOILER} {body}"))
    # sprinkle exact copies so the takedown hits real clusters
    for i in range(1, n_docs, 200):
        rows[i] = (rows[i][0], rows[i - 1][1])
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    doomed = sorted(rng.sample(range(1, n_docs + 1), n_docs // 100))
    root = tempfile.mkdtemp()

    t = time.time()
    cm = build_cluster_map(
        corpus, "text", "doc_id", f"{root}/base", n=3, threshold=0.8
    )
    t_build = time.time() - t
    dedup.release_caches()
    m = int(cm.entry["max_df"])

    t = time.time()
    cm2 = retire_cluster_map(spark, f"{root}/base", doomed)
    t_retire = time.time() - t
    dedup.release_caches()

    t = time.time()
    reb = build_cluster_map(
        corpus.where(~F.col("doc_id").isin(doomed)),
        "text", "doc_id", f"{root}/reb", n=3, threshold=0.8, max_df=m,
    )
    t_rebuild = time.time() - t
    dedup.release_caches()

    a = sorted(
        (r["doc_id"], r["component_id"]) for r in cm2.members().collect()
    )
    b = sorted(
        (r["doc_id"], r["component_id"]) for r in reb.members().collect()
    )
    identical = a == b
    print(
        f'{{"n_docs": {n_docs}, "n_retired": {len(doomed)}, '
        f'"build_s": {t_build:.1f}, "retire_s": {t_retire:.1f}, '
        f'"rebuild_s": {t_rebuild:.1f}, '
        f'"speedup": {t_rebuild / t_retire:.2f}, '
        f'"identical": {str(identical).lower()}}}'
    )
    shutil.rmtree(root, ignore_errors=True)
    return 0 if identical else 1


if __name__ == "__main__":
    raise SystemExit(main())
