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
