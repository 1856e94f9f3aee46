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
