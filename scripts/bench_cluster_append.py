#!/usr/bin/env python
"""Reproduce the cluster-map append-vs-rebuild crossover (SCALE.md).

Builds a boilerplate-heavy synthetic corpus (shared template sentence
→ hot shingles, so the rebuild pays the full hot-doc signature path),
splits 99/1, and times: warm build of the 99%, the 1% append, and a
from-scratch rebuild of the union at the same frozen max_df — then
verifies the append and the rebuild assign identical components.

Usage: python scripts/bench_cluster_append.py [n_docs]   (default 60000;
the SCALE.md headline number used 400000 — ~20 min on local[32])
"""
from __future__ import annotations

import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from queens_spark.operators import dedup
from queens_spark.session import get_spark
from queens_spark.store.cluster_map import (
    append_cluster_map,
    build_cluster_map,
)

BOILER = (
    "all rights reserved contact us terms of service privacy policy "
    "cookie notice subscribe to newsletter follow on social"
)


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 60_000
    n_batch = max(100, n_docs // 100)
    spark = get_spark()
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(max(5000, n_docs // 20))]

    def doc(i: int):
        n = rng.randint(20, 50)
        body = " ".join(rng.choice(vocab) for _ in range(n))
        return (i, body + " " + BOILER)

    rows = [doc(i) for i in range(n_docs)]
    cut = n_docs - n_batch
    A = spark.createDataFrame(rows[:cut], ["doc_id", "text"]).repartition(64)
    B = spark.createDataFrame(rows[cut:], ["doc_id", "text"]).repartition(8)

    root = tempfile.mkdtemp(prefix="qs_cm_bench_")
    # warm-up: one small clustering pays session codegen/shuffle warmup
    build_cluster_map(A.limit(2000), "text", "doc_id", f"{root}/warm",
                      n=3, threshold=0.8)
    dedup.release_caches()

    t = time.time()
    cm = build_cluster_map(A, "text", "doc_id", f"{root}/base",
                           n=3, threshold=0.8)
    t_build = time.time() - t
    dedup.release_caches()
    m = int(cm.entry["max_df"])

    t = time.time()
    cm2 = append_cluster_map(B, f"{root}/base")
    t_append = time.time() - t
    dedup.release_caches()

    t = time.time()
    reb = build_cluster_map(A.union(B), "text", "doc_id", f"{root}/reb",
                            n=3, threshold=0.8, max_df=m)
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
        f'{{"n_docs": {n_docs}, "n_batch": {n_batch}, '
        f'"build_s": {t_build:.1f}, "append_s": {t_append:.1f}, '
        f'"rebuild_s": {t_rebuild:.1f}, '
        f'"speedup": {t_rebuild / t_append:.2f}, '
        f'"identical": {str(identical).lower()}}}'
    )
    shutil.rmtree(root, ignore_errors=True)
    return 0 if identical else 1


if __name__ == "__main__":
    raise SystemExit(main())
