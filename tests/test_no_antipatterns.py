"""Catalog-wide anti-pattern gate: every query's physical plan is free
of row-at-a-time Python UDFs (BatchEvalPython) and unbroadcast
cartesian products — the two silent scale-killers. Arrow-batched
pandas ops (MapInPandas/ArrowEvalPython, FlatMapGroupsInPandas) and
broadcast nested-loop joins (the physical shape of a broadcast
crossJoin) are the sanctioned exceptions.
"""

import pytest

from queens_spark.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"

#: streaming entries execute availableNow on build — they return a
#: batch result read from a memory sink, whose plan is a table scan;
#: their transformation plans are covered by q52–q54's oracles.
_SKIP = {"q52_stream_windowed_counts", "q53_stream_sessions", "q87_stream_cms_counts", "q96_stream_interval_join", "q100_stream_novelty", "q180_stream_mix_drift",
         "q54_stream_first_seen", "q69_stream_hll_distinct",
         "q202_stream_funnel"}


@pytest.mark.parametrize("name", sorted(n for n in QUERIES if n not in _SKIP))
def test_no_antipatterns(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, f"{name}: row-at-a-time Python UDF"
    assert "CartesianProduct" not in plan, f"{name}: unbroadcast cartesian"
    spark.catalog.clearCache()
