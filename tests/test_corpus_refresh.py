"""End-to-end corpus refresh: the round-9 lifecycle tiers composed —
a new batch flows ledger-screen → warehouse append → O(batch) index
appends (text + vector), after which hybrid retrieval and
decontamination both see the new documents with no full-corpus stage
anywhere in a served plan."""

import contextlib
import io

import pytest

from pyspark.sql import Window, functions as F

from queens_spark.facade import Engine

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.slow
def test_corpus_refresh_end_to_end(spark, tmp_path):
    eng = Engine(spark, str(tmp_path / "wh"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # ---- day 1: build the corpus + both indexes on batch 1
    b1 = docs.where(F.col("doc_id") < 300)
    fresh1, s1 = eng.ingest_deduped(b1, "text", "doc_id")
    n1 = s1["accepted"]
    assert n1 <= 300
    fresh1_ids = fresh1.select("doc_id")
    eng.build_text_index(fresh1, "text", "doc_id", "corpus")
    eng.build_vector_index(
        emb.join(fresh1_ids.withColumnRenamed("doc_id", "vec_id"),
                 "vec_id"),
        "embedding", "vec_id", "corpus",
    )

    # ---- day 2: batch 2 = genuinely new docs + re-crawled dups
    dups = docs.where(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 10_000).alias("doc_id"), "text"
    )
    b2 = docs.where((F.col("doc_id") >= 300)).select(
        "doc_id", "text"
    ).unionByName(dups)
    fresh2, s2 = eng.ingest_deduped(b2, "text", "doc_id")
    # every re-crawled dup is screened out by the ledger
    assert s2["ledger_dupes"] >= 10
    assert fresh2.where(F.col("doc_id") >= 10_000).count() == 0
    n2 = s2["accepted"]

    # O(batch) index refresh: only the survivors are tokenized/encoded
    tidx = eng.append_text_index(fresh2, "corpus")
    vidx = eng.append_vector_index(
        emb.join(fresh2.select("doc_id").withColumnRenamed(
            "doc_id", "vec_id"), "vec_id"),
        "corpus",
    )
    assert tidx.describe()["n_docs"] == n1 + n2
    assert vidx.pq_codes().count() == n1 + n2

    # ---- retrieval sees the new docs, from stored artifacts only
    qid = 450  # a batch-2 document
    qvec = [float(x) for x in emb.where(F.col("vec_id") == qid)
            .collect()[0]["embedding"]]
    terms = sorted({r["t"] for r in docs.where(F.col("doc_id") == qid)
                    .select(F.explode(F.split("text", r"\s+")).alias("t"))
                    .where(F.col("t") != "").distinct().collect()})

    tidx = eng.text_index("corpus")   # fresh handles: manifest only
    vidx = eng.vector_index("corpus")
    pool, rrf_k = 20, 60
    bm = tidx.bm25_topk(terms, k=pool).withColumn(
        "bm25_rank", F.row_number().over(
            Window.orderBy(F.desc("bm25_e5"), F.asc("doc"))
        ).cast("bigint")
    ).select(F.col("doc").alias("doc_id"), "bm25_rank")
    ad = vidx.adc_topk(qvec, k=pool).withColumn(
        "adc_rank", F.row_number().over(
            Window.orderBy(F.asc("adist"), F.asc("vec_id"))
        ).cast("bigint")
    ).select(F.col("vec_id").alias("doc_id"), "adc_rank")
    fused = bm.join(ad, "doc_id", "full_outer").select(
        "doc_id",
        (F.coalesce(F.expr(f"1000000000000 div ({rrf_k} + bm25_rank)"),
                    F.lit(0))
         + F.coalesce(F.expr(f"1000000000000 div ({rrf_k} + adc_rank)"),
                      F.lit(0))).alias("rrf_e12"),
    ).orderBy(F.desc("rrf_e12"), F.asc("doc_id")).limit(10)
    plan = plan_of(fused)
    # hybrid retrieval runs on STORED artifacts: no tokenize stage, no
    # corpus parquet, no encode — O(query), not O(corpus)
    assert "Generate" not in plan
    assert "documents.parquet" not in plan
    assert "embeddings.parquet" not in plan
    top = [r["doc_id"] for r in fused.collect()]
    assert top[0] == qid  # the batch-2 doc retrieves itself
    assert any(d >= 300 for d in top)

    # ---- decontamination: a later batch containing batch-2 content
    # is screened against EVERYTHING accepted so far
    b3 = docs.where(F.col("doc_id") == qid).select(
        (F.col("doc_id") + 20_000).alias("doc_id"), "text"
    )
    _, s3 = eng.ingest_deduped(b3, "text", "doc_id")
    assert s3 == {"batch": 1, "in_batch_dupes": 0,
                  "ledger_dupes": 1, "accepted": 0}


def test_engine_hybrid_search_and_rrf_fuse(spark, tmp_path):
    """Engine.hybrid_search fuses the stored BM25 and ADC pools with
    exact integer RRF; rrf_fuse itself is verified against a python
    reference on the same pools, and the served plan touches neither
    corpus parquet."""
    from pyspark.sql import functions as F

    from queens_spark.facade import Engine
    from queens_spark.operators.retrieval import RRF_SCALE, rrf_fuse

    eng = Engine(spark, str(tmp_path / "wh"))
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    eng.build_text_index(docs, "text", "doc_id", "c")
    eng.build_vector_index(emb, "embedding", "vec_id", "c")
    qvec = [float(x) for x in
            emb.where(F.col("vec_id") == 42).collect()[0]["embedding"]]
    terms = ["dup", "spark", "merge"]
    out = eng.hybrid_search("c", "c", terms, qvec, k=10, pool=20)
    plan_txt = out._jdf.queryExecution().executedPlan().toString()
    assert "documents.parquet" not in plan_txt
    assert "embeddings.parquet" not in plan_txt
    rows = out.collect()
    assert len(rows) == 10

    # python reference over the same pools
    bm = [(r["doc"], r["bm25_e5"]) for r in
          eng.text_index("c").bm25_topk(terms, k=20).collect()]
    ad = [(r["vec_id"], r["adist"]) for r in
          eng.vector_index("c").adc_topk(qvec, k=20).collect()]
    ranks: dict[int, list] = {}
    for i, (pool, asc) in enumerate([(bm, False), (ad, True)]):
        ordered = sorted(pool, key=lambda kv: ((kv[1] if asc else -kv[1]),
                                               kv[0]))
        for rk, (d, _) in enumerate(ordered, 1):
            ranks.setdefault(d, [None, None])[i] = rk
    want = sorted(
        ((sum(RRF_SCALE // (60 + r) for r in rs if r), d)
         for d, rs in ranks.items()),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(r["rrf_e12"], r["doc"]) for r in rows] == want

    with pytest.raises(ValueError, match=">= 2 pools"):
        rrf_fuse([(out, "rrf_e12", False)], "doc")


def test_mmr_rerank_diversifies_duplicate_heavy_pool(spark):
    """MMR: a corpus where the most relevant vector appears as many
    near-copies must NOT fill the top-k with copies — after the first
    pick, the copies' max-sim penalty (≈1) sinks them below distinct
    directions. Pure top-k (rank by relevance alone) is the control."""
    from queens_spark.operators.retrieval import mmr_rerank

    dim = 8
    rows = []
    # 5 near-copies of the query direction (ids 0-4), then 20 spread
    for i in range(5):
        rows.append((i, [10.0 + 0.001 * i] + [0.001 * i] * (dim - 1)))
    for i in range(5, 25):
        v = [1.0] * dim
        v[i % dim] += 6.0
        rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    q = [10.0] + [0.0] * (dim - 1)

    out = mmr_rerank(emb, "embedding", "vec_id", q, pool=25, k=5,
                     lam=0.3).collect()
    ids = [r["vec_id"] for r in out]
    assert ids[0] == 0                      # most relevant first
    assert sum(1 for i in ids if i < 5) == 1  # copies collapsed to one
    assert ids == [0, 5, 6, 7, 9]  # numerically pre-verified greedy
    assert [r["mmr_rank"] for r in out] == [1, 2, 3, 4, 5]
    # relevance is the exact cosine (rank-1 pick ~ 1.0 to the query)
    assert out[0]["relevance"] > 0.999
    # lam=1.0 degenerates to pure relevance ranking (the control)
    pure = mmr_rerank(emb, "embedding", "vec_id", q, pool=25, k=5,
                      lam=1.0).collect()
    assert [r["vec_id"] for r in pure] == [0, 1, 2, 3, 4]  # all copies

    with pytest.raises(ValueError, match="lam"):
        mmr_rerank(emb, "embedding", "vec_id", q, k=3, lam=1.5)
    with pytest.raises(ValueError, match="pool >= k"):
        mmr_rerank(emb, "embedding", "vec_id", q, pool=5, k=10)
    # a zero-norm corpus vector fails LOUD, never a silent NaN rank:
    # ANSI mode raises in the distributed relevance pass; the driver
    # guard ("zero quantized norm") backstops non-ANSI sessions
    zero = emb.union(spark.createDataFrame(
        [(99, [0.0] * dim)], "vec_id bigint, embedding array<double>"))
    with pytest.raises(Exception,
                       match="DIVIDE_BY_ZERO|zero quantized norm"):
        mmr_rerank(zero, "embedding", "vec_id", q, pool=26, k=3)
