"""Salted join: identical results to a plain join, with the shuffle
spread over per-salt sub-partitions (the explicit hot-key fix)."""

import pytest
from pyspark.sql import Row, functions as F

from queens_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one pathologically hot key (90% of rows) + a long tail
    rows = [Row(k=0, uid=i, v=i % 7) for i in range(900)] + [
        Row(k=1 + i % 50, uid=10_000 + i, v=i % 5) for i in range(100)
    ]
    dim = [Row(k=i, label=f"d{i}") for i in range(51)]
    return spark.createDataFrame(rows), spark.createDataFrame(dim)


def test_salted_join_matches_plain_join(skewed):
    big, dim = skewed
    plain = big.join(dim, "k").groupBy("label").count().collect()
    salted = (
        salted_join(big, dim, "k", salt_from="uid", n_salts=8)
        .groupBy("label").count().collect()
    )
    as_map = lambda rs: {r["label"]: r["count"] for r in rs}
    assert as_map(salted) == as_map(plain)


def test_salted_left_join_keeps_unmatched_big_rows(skewed):
    big, dim = skewed
    dim_partial = dim.where(F.col("k") != 0)  # the hot key is unmatched
    out = salted_join(big, dim_partial, "k", salt_from="uid", how="left")
    assert out.count() == 1000
    assert out.where("label IS NULL").count() == 900  # hot rows kept once


def test_salted_join_shuffles_on_salt(skewed, spark):
    big, dim = skewed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = salted_join(big, dim, "k", salt_from="uid")._jdf \
            .queryExecution().executedPlan().toString()
        # the exchange key must carry the salt: that IS the skew fix
        assert "__salt" in plan.split("Exchange", 1)[1].split("\n", 1)[0]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_salted_join_rejects_replica_multiplying_modes(skewed):
    big, dim = skewed
    with pytest.raises(ValueError, match="inner.*left"):
        salted_join(big, dim, "k", salt_from="uid", how="full")
