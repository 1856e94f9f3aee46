"""The vectorized (Arrow/numpy) and Column-expression forms of the
bulk vector operators must be BIT-identical — same quantization, same
integer arithmetic, same IEEE cosine — or query plans could silently
change results when switching paths at scale."""

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_bucket_forms_identical(spark):
    from queens_spark.operators.similarity import lsh_bucket, lsh_bucket_vectors

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    col_form = {
        r["vec_id"]: r["bucket"]
        for r in emb.select(
            "vec_id", lsh_bucket("embedding", 64).alias("bucket")
        ).collect()
    }
    np_form = {
        r["vec_id"]: r["bucket"]
        for r in lsh_bucket_vectors(emb, "embedding", "vec_id", 64).collect()
    }
    assert col_form == np_form and len(col_form) > 0


def test_ivf_assign_forms_identical(spark):
    from queens_spark.operators.similarity import ivf_assign, ivf_assign_vectors

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cent_ids = [r[0] for r in
                emb.where(F.col("vec_id") % 50 == 0).select("vec_id").collect()]
    col_form = {
        r["vec_id"]: (r["centroid_id"], r["centroid_cosine"])
        for r in ivf_assign(emb, "embedding", "vec_id", cent_ids).collect()
    }
    np_form = {
        r["vec_id"]: (r["centroid_id"], r["centroid_cosine"])
        for r in ivf_assign_vectors(
            emb, "embedding", "vec_id", cent_ids
        ).collect()
    }
    # exact equality, including the cosine doubles — no tolerance
    assert col_form == np_form and len(col_form) > 0


def test_hash_sample_stability_and_bounds(spark):
    from queens_spark.operators.sampling import BUCKETS, hash_bucket, hash_sample

    df = spark.range(10_000).withColumnRenamed("id", "k")
    kept = hash_sample(df, "k", fraction_bp=2000)
    n = kept.count()
    # ~20% with hash-uniformity slack
    assert 1600 <= n <= 2400, n
    # per-key decision is stable across reruns and repartitioning
    a = {r["k"] for r in kept.collect()}
    b = {r["k"] for r in hash_sample(df.repartition(7), "k", 2000).collect()}
    assert a == b
    # buckets stay in range
    mx = df.select(F.max(hash_bucket("k")).alias("m")).collect()[0]["m"]
    assert 0 <= mx < BUCKETS


def test_stratified_hash_sample_rates(spark):
    from queens_spark.operators.sampling import stratified_hash_sample

    df = spark.range(6_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
    )
    kept = stratified_hash_sample(df, "k", "lang", {"en": 5000, "de": 1000})
    rates = {r["lang"]: r["n"] for r in
             kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert 1350 <= rates["en"] <= 1650   # ~50% of 3000
    assert 200 <= rates["de"] <= 400     # ~10% of 3000


def test_hash_split_partition_exhaustive_and_stable(spark):
    from queens_spark.operators.sampling import hash_split

    df = spark.range(8_000).withColumnRenamed("id", "k")
    splits = {"train": 8000, "val": 1000, "test": 1000}
    assigned = df.select("k", hash_split("k", splits).alias("s"))
    counts = {r["s"]: r["n"] for r in
              assigned.groupBy("s").agg(F.count(F.lit(1)).alias("n")).collect()}
    # fractions sum to 100% -> no NULL (held-out) rows
    assert None not in counts and sum(counts.values()) == 8_000
    assert 6000 <= counts["train"] <= 7600
    assert 500 <= counts["val"] <= 1100 and 500 <= counts["test"] <= 1100
    # membership survives repartitioning (no leak between sets)
    again = {(r["k"], r["s"]) for r in
             df.repartition(13).select(
                 "k", hash_split("k", splits).alias("s")).collect()}
    assert again == {(r["k"], r["s"]) for r in assigned.collect()}


def test_hash_split_holdout_and_validation(spark):
    import pytest

    from queens_spark.operators.sampling import hash_split

    df = spark.range(1_000).withColumnRenamed("id", "k")
    held = df.select(hash_split("k", {"train": 5000}).alias("s"))
    n_null = held.where(F.col("s").isNull()).count()
    assert 400 <= n_null <= 600  # ~50% held out
    with pytest.raises(ValueError, match="split fractions"):
        hash_split("k", {"a": 9000, "b": 2000})
