"""Text-index (stored BM25 postings) lifecycle: build -> persist ->
cross-session load -> serve with NO tokenize stage; append == rebuild
bit-identically; compaction; staleness; orphan invisibility; Engine +
CLI surfaces."""

import contextlib
import io
import json
import os

import pytest
from pyspark.sql import functions as F

from queens_spark.operators.corpus import bm25_topk
from queens_spark.store.text_index import (
    build_or_load_text_index,
    build_text_index,
    append_text_index,
    compact_text_index,
    load_text_index,
    token_bucket,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"
TERMS = ["dup", "spark", "merge"]


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(DOCS)


def _rows(df):
    return [(r["doc"], r["bm25_e5"], r["n_terms"]) for r in df.collect()]


def test_served_bm25_bit_identical_to_inline(spark, docs, tmp_path):
    """The stored-postings scorer must reproduce the inline
    full-corpus scorer exactly: same integer tf/dl/df/N/T, same
    rational-idf arithmetic, same tie-break — so q110's oracle is
    unchanged when it serves from the index."""
    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir)
    idx = load_text_index(spark, idir, "d")  # fresh handle
    assert _rows(idx.bm25_topk(TERMS, k=10)) == _rows(
        bm25_topk(docs, "text", "doc_id", TERMS, k=10)
    )


def test_served_plan_has_no_tokenize_and_prunes_buckets(spark, docs, tmp_path):
    """The deployment claim, plan-gated: a served search reads ONLY
    the postings artifact — bucket partition pruning in the scan, no
    explode/tokenize stage (Generate), no documents.parquet, and no
    corpus-stats job (stats come from the manifest)."""
    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir)
    idx = load_text_index(spark, idir, "d")
    plan = plan_of(idx.bm25_topk(TERMS, k=10))
    assert "PartitionFilters" in plan
    assert "tok_bucket" in plan.split("PartitionFilters", 1)[1][:400]
    assert "Generate" not in plan          # no explode/tokenize stage
    assert "documents.parquet" not in plan  # corpus never touched
    assert "TakeOrderedAndProject" in plan


def test_append_equals_full_rebuild(spark, docs, tmp_path):
    """Index half the corpus, append the other half: stats (manifest
    sum/max) and served scores must be BIT-IDENTICAL to one build over
    the full corpus — the O(new-data) ingest contract."""
    a = docs.where(F.col("doc_id") < 250)
    b = docs.where(F.col("doc_id") >= 250)
    inc_dir = str(tmp_path / "inc")
    full_dir = str(tmp_path / "full")
    build_text_index(a, "text", "doc_id", "d", inc_dir)
    inc = append_text_index(b, "d", inc_dir)
    full = build_text_index(docs, "text", "doc_id", "d", full_dir)
    assert inc.stats() == full.stats()
    assert _rows(inc.bm25_topk(TERMS, k=10)) == _rows(
        full.bm25_topk(TERMS, k=10)
    )
    # and each segment's scan still bucket-prunes after the union
    plan = plan_of(inc.bm25_topk(TERMS, k=10))
    assert plan.count("PartitionFilters") >= 2


def test_append_then_compact_unchanged(spark, docs, tmp_path):
    idir = str(tmp_path / "tidx")
    build_text_index(docs.where(F.col("doc_id") < 250),
                     "text", "doc_id", "d", idir)
    append_text_index(docs.where(F.col("doc_id") >= 250), "d", idir)
    before = _rows(load_text_index(spark, idir, "d").bm25_topk(TERMS, k=10))
    idx = compact_text_index(spark, idir, "d")
    assert len(idx.entry["segments"]) == 1
    assert _rows(idx.bm25_topk(TERMS, k=10)) == before
    # single-segment compact is a no-op (same version)
    v = idx.entry["version"]
    assert compact_text_index(spark, idir, "d").entry["version"] == v
    # the lifecycle keeps working after compaction
    idx2 = append_text_index(
        docs.where(F.col("doc_id") < 0), "d", idir)  # empty batch ok
    assert _rows(load_text_index(spark, idir, "d").bm25_topk(TERMS, k=10)) \
        == before


def test_orphan_segment_invisible(spark, docs, tmp_path):
    """A postings dir the manifest never listed (crash mid-append) is
    not part of the index."""
    idir = str(tmp_path / "tidx")
    idx = build_text_index(docs, "text", "doc_id", "d", idir)
    n, t, maxdl = idx.stats()
    vdir = os.path.dirname(idx.entry["segments"][0]["path"])
    docs.limit(5).select(
        F.col("doc_id"), F.lit("tok").alias("token"),
        F.lit(1).alias("tf"), F.lit(1).alias("dl"),
        F.lit(0).alias("tok_bucket"),
    ).write.parquet(os.path.join(vdir, "postings_seg_orphan"))
    again = load_text_index(spark, idir, "d")
    assert again.stats() == (n, t, maxdl)
    assert len(again.entry["segments"]) == 1


def test_staleness_and_build_or_load(spark, docs, tmp_path):
    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir, fingerprint="fp1")
    assert load_text_index(spark, idir, "d",
                           expected_fingerprint="fp1").fingerprint == "fp1"
    with pytest.raises(ValueError, match="stale"):
        load_text_index(spark, idir, "d", expected_fingerprint="fp2")
    with pytest.raises(KeyError):
        load_text_index(spark, idir, "nope")
    # build_or_load: matching fingerprint loads (same version);
    # changed fingerprint rebuilds (version bump)
    same = build_or_load_text_index(docs, "text", "doc_id", "d", idir,
                                    fingerprint="fp1")
    assert same.entry["version"] == 1
    rebuilt = build_or_load_text_index(docs, "text", "doc_id", "d", idir,
                                       fingerprint="fp2")
    assert rebuilt.entry["version"] == 2


def test_guards(spark, docs, tmp_path):
    idir = str(tmp_path / "tidx")
    idx = build_text_index(docs, "text", "doc_id", "d", idir)
    with pytest.raises(ValueError, match="non-empty"):
        idx.bm25_topk([])
    with pytest.raises(ValueError, match="envelope"):
        idx.bm25_topk(TERMS, scale=2**62)
    with pytest.raises(KeyError):
        append_text_index(docs, "nope", idir)
    with pytest.raises(KeyError):
        compact_text_index(spark, idir, "nope")


def test_token_bucket_matches_spark(spark):
    """Driver-side crc32 bucketing must agree byte-for-byte with the
    stored column's Spark expression — it IS the partition pruner."""
    toks = ["dup", "spark", "merge", "café", "日本語", ""]
    df = spark.createDataFrame([(t,) for t in toks], ["token"])
    got = {
        r["token"]: r["b"]
        for r in df.select(
            "token",
            (F.crc32(F.encode(F.col("token"), "utf-8")) % 64)
            .cast("int").alias("b"),
        ).collect()
    }
    assert got == {t: token_bucket(t, 64) for t in toks}


def test_engine_and_cli_surfaces(spark, docs, tmp_path, capsys):
    from queens_spark.cli import main
    from queens_spark.facade import Engine

    root = str(tmp_path / "wh")
    eng = Engine(spark, root)
    eng.build_text_index(docs.where(F.col("doc_id") < 400),
                         "text", "doc_id", "docs")
    eng.append_text_index(docs.where(F.col("doc_id") >= 400), "docs")
    idx = eng.text_index("docs")
    assert idx.describe()["n_docs"] == docs.count()
    assert len(idx.entry["segments"]) == 2
    # empty append adds no segment (nothing to read back)
    eng.append_text_index(docs.where(F.lit(False)), "docs")
    assert len(eng.text_index("docs").entry["segments"]) == 2

    rc = main(["--warehouse", root, "tindex", "search", "docs",
               "--terms", "dup,spark", "--k", "3"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["results"]) == 3
    rc = main(["--warehouse", root, "tindex", "search", "docs"])
    assert rc == 2  # missing --terms -> taxonomy error path


def test_delete_equals_rebuild_bit_identically(spark, docs, tmp_path):
    """Tombstoning docs D must make every served BM25 score equal a
    fresh build over corpus \\ D — same N, T, df, tf, dl end to end
    (the stats deltas are exact, not approximate)."""
    from queens_spark.store.text_index import delete_from_text_index

    doomed = [26, 236, 134, 7]
    idir = str(tmp_path / "full")
    rdir = str(tmp_path / "rebuilt")
    build_text_index(docs, "text", "doc_id", "d", idir)
    idx = delete_from_text_index(spark, idir, "d", doomed)
    rebuilt = build_text_index(
        docs.where(~F.col("doc_id").isin(doomed)),
        "text", "doc_id", "d", rdir,
    )
    assert idx.stats()[:2] == rebuilt.stats()[:2]  # N, T exact
    assert _rows(idx.bm25_topk(TERMS, k=20)) == _rows(
        rebuilt.bm25_topk(TERMS, k=20)
    )
    # deleting ids that were never indexed is a harmless tombstone
    idx = delete_from_text_index(spark, idir, "d", [10_000, 10_001])
    assert idx.stats()[:2] == rebuilt.stats()[:2]
    assert _rows(idx.bm25_topk(TERMS, k=20)) == _rows(
        rebuilt.bm25_topk(TERMS, k=20)
    )


@pytest.mark.slow
def test_delete_compact_and_reappend_cycle(spark, docs, tmp_path):
    """Compaction applies tombstones physically (rows gone, stats
    exact, deltas folded); re-appending a retired doc serves the new
    postings (coverage scoping)."""
    from queens_spark.store.text_index import delete_from_text_index

    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir)
    idx = delete_from_text_index(spark, idir, "d", [26, 236])
    before = _rows(idx.bm25_topk(TERMS, k=10))
    assert 26 not in {r[0] for r in before}
    idx = compact_text_index(spark, idir, "d")
    assert idx.entry["deletes"] is None
    assert idx.describe()["tombstone_segments"] == 0
    raw = idx.postings()
    assert raw.where(F.col("doc_id").isin([26, 236])).count() == 0
    assert _rows(idx.bm25_topk(TERMS, k=10)) == before
    # re-ingest the retired docs: tombstones are gone post-compact,
    # so a plain append serves them again
    idx = append_text_index(
        docs.where(F.col("doc_id").isin([26, 236])), "d", idir)
    full = build_text_index(docs, "text", "doc_id", "d",
                            str(tmp_path / "full"))
    assert idx.stats() == full.stats()
    assert _rows(idx.bm25_topk(TERMS, k=10)) == _rows(
        full.bm25_topk(TERMS, k=10))
    # coverage scoping: delete-then-reappend WITHOUT compacting also
    # serves the new postings exactly once
    idx = delete_from_text_index(spark, idir, "d", [26])
    idx = append_text_index(
        docs.where(F.col("doc_id") == 26), "d", idir)
    assert idx.stats() == full.stats()
    assert _rows(idx.bm25_topk(TERMS, k=10)) == _rows(
        full.bm25_topk(TERMS, k=10))


def test_delete_surfaces(spark, docs, tmp_path, capsys):
    import json as _json

    from queens_spark.cli import main
    from queens_spark.facade import Engine

    root = str(tmp_path / "wh")
    eng = Engine(spark, root)
    eng.build_text_index(docs, "text", "doc_id", "docs")
    idx = eng.delete_from_text_index("docs", [26])
    assert idx.describe()["tombstone_segments"] == 1
    rc = main(["--warehouse", root, "tindex", "delete", "docs",
               "--ids", "236"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"deleted_from": "docs", "tombstone_segments": 2}
    got = {r[0] for r in _rows(eng.text_index("docs")
                               .bm25_topk(TERMS, k=20))}
    assert not ({26, 236} & got)
    assert main(["--warehouse", root, "tindex", "delete", "docs"]) == 2


def test_batch_bm25_matches_single_query_and_guards(spark, docs, tmp_path):
    """batch_bm25_topk must reproduce bm25_topk's exact scores per
    query block entry, in one postings pass."""
    from pyspark.sql import Row

    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir)
    idx = load_text_index(spark, idir, "d")
    queries = {1: ["dup", "spark", "merge"], 2: ["the", "dup"]}
    qdf = spark.createDataFrame(
        [Row(query_id=q, terms=t) for q, t in queries.items()])
    got = {
        (r["query_id"], r["doc"], r["bm25_e5"], r["n_terms"])
        for r in idx.batch_bm25_topk(qdf, k=7).collect()
    }
    want = set()
    for q, terms in queries.items():
        for r in idx.bm25_topk(terms, k=7).collect():
            want.add((q, r["doc"], r["bm25_e5"], r["n_terms"]))
    assert got == want
    # plan: still bucket-pruned, still no tokenize stage
    plan = plan_of(idx.batch_bm25_topk(qdf, k=7))
    assert "PartitionFilters" in plan and "Generate" not in plan
    with pytest.raises(ValueError, match="no terms"):
        idx.batch_bm25_topk(qdf.where(F.lit(False)))


@pytest.mark.slow
def test_filtered_bm25_restrict_then_rank(spark, docs, tmp_path):
    """meta_cols denormalize onto the postings; a predicate restricts
    the candidate pool scan-side while scores stay global BM25 —
    every returned doc satisfies the filter, scores equal the
    unfiltered scorer's for those docs, and no documents join exists
    in the plan."""
    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir,
                     meta_cols=["source", "lang"])
    idx = load_text_index(spark, idir, "d")
    flt = idx.bm25_topk(TERMS, k=10, predicate="source = 'src7'")
    rows = flt.collect()
    assert rows
    srcs = {r["source"] for r in
            docs.join(flt.select(F.col("doc").alias("doc_id")),
                      "doc_id").select("source").collect()}
    assert srcs == {"src7"}
    unf = {r["doc"]: (r["bm25_e5"], r["n_terms"])
           for r in idx.bm25_topk(TERMS, k=500).collect()}
    for r in rows:
        assert unf[r["doc"]] == (r["bm25_e5"], r["n_terms"])
    plan = plan_of(flt)
    assert "documents.parquet" not in plan and "Generate" not in plan
    # batch path takes the same predicate
    from pyspark.sql import Row

    b = idx.batch_bm25_topk(
        spark.createDataFrame([Row(query_id=1, terms=TERMS)]),
        k=10, predicate="source = 'src7'")
    assert [(r["doc"], r["bm25_e5"]) for r in b.collect()] == \
        [(r["doc"], r["bm25_e5"]) for r in rows]
    # an index without meta_cols refuses predicates
    ndir = str(tmp_path / "nometa")
    build_text_index(docs, "text", "doc_id", "d", ndir)
    with pytest.raises(ValueError, match="meta_cols"):
        load_text_index(spark, ndir, "d").bm25_topk(
            TERMS, predicate="source = 'src7'")
    # build_or_load upgrades an index lacking requested meta_cols
    up = build_or_load_text_index(docs, "text", "doc_id", "d", ndir,
                                  meta_cols=["source"])
    assert up.entry["version"] == 2


@pytest.mark.slow
def test_phrase_search_exact_and_guards(spark, docs, tmp_path):
    """Positional postings: phrase_topk counts exact consecutive-token
    occurrences (verified against a brute-force scan), works across
    appended segments, respects predicates, and refuses an index
    built without positions."""
    import re

    idir = str(tmp_path / "tidx")
    build_text_index(docs.where(F.col("doc_id") < 250), "text",
                     "doc_id", "d", idir,
                     meta_cols=["source"], positions=True)
    append_text_index(docs.where(F.col("doc_id") >= 250), "d", idir)
    idx = load_text_index(spark, idir, "d")

    def brute(phrase, restrict=None):
        got = {}
        for r in docs.collect():
            if restrict and not restrict(r):
                continue
            toks = [t for t in re.split(r"\s+", r["text"]) if t]
            n = sum(1 for i in range(len(toks) - len(phrase) + 1)
                    if toks[i:i + len(phrase)] == phrase)
            if n:
                got[r["doc_id"]] = n
        return sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))

    out = [(r["doc"], r["n_occurrences"])
           for r in idx.phrase_topk(["table", "hash"], k=10).collect()]
    assert out == brute(["table", "hash"])[:10] and out
    # duplicate-term phrase exercises the same-array-two-offsets path
    dup = [(r["doc"], r["n_occurrences"])
           for r in idx.phrase_topk(["the", "the"], k=10).collect()]
    assert dup == brute(["the", "the"])[:10]
    # filtered phrase search
    flt = [(r["doc"], r["n_occurrences"])
           for r in idx.phrase_topk(["table", "hash"], k=10,
                                    predicate="source = 'src7'")
           .collect()]
    assert flt == brute(["table", "hash"],
                        restrict=lambda r: r["source"] == "src7")[:10]
    # plan: no tokenize stage, bucket-pruned
    plan = plan_of(idx.phrase_topk(["table", "hash"], k=10))
    assert "Generate" not in plan and "PartitionFilters" in plan
    with pytest.raises(ValueError, match="non-empty"):
        idx.phrase_topk([])
    ndir = str(tmp_path / "nopos")
    build_text_index(docs, "text", "doc_id", "d", ndir)
    with pytest.raises(ValueError, match="positional"):
        load_text_index(spark, ndir, "d").phrase_topk(["table", "hash"])
    # build_or_load upgrades a positions-less index on request
    up = build_or_load_text_index(docs, "text", "doc_id", "d", ndir,
                                  positions=True)
    assert up.entry["version"] == 2 and up.describe()["positions"]


def test_conjunctive_and_proximity(spark, docs, tmp_path):
    """require_all keeps only all-terms docs with unchanged scores;
    proximity_topk counts within-window co-occurrences (verified
    against a brute-force scan)."""
    import re

    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir, positions=True)
    idx = load_text_index(spark, idir, "d")

    both = idx.bm25_topk(TERMS, k=500, require_all=True).collect()
    assert both and all(r["n_terms"] == 3 for r in both)
    unf = {r["doc"]: r["bm25_e5"]
           for r in idx.bm25_topk(TERMS, k=500).collect()}
    assert all(unf[r["doc"]] == r["bm25_e5"] for r in both)

    w, terms = 4, ["table", "join"]
    got = [(r["doc"], r["n_windows"])
           for r in idx.proximity_topk(terms, window=w, k=10).collect()]
    brute = {}
    for r in docs.collect():
        toks = [t for t in re.split(r"\s+", r["text"]) if t]
        pos = {t: [i for i, x in enumerate(toks) if x == t]
               for t in terms}
        if any(not pos[t] for t in terms):
            continue
        n = sum(1 for p in pos[terms[0]]
                if all(any(abs(q - p) <= w for q in pos[t])
                       for t in terms[1:]))
        if n:
            brute[r["doc_id"]] = n
    expect = sorted(brute.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == expect and got
    with pytest.raises(ValueError, match="window"):
        idx.proximity_topk(terms, window=0)


@pytest.mark.slow
def test_predicate_delete_and_cli_modes(spark, docs, tmp_path, capsys):
    """delete by meta predicate (lexical twin of the vector side's);
    CLI serves phrase/proximity/conjunctive modes."""
    import json as _json

    from queens_spark.cli import main
    from queens_spark.facade import Engine
    from queens_spark.store.text_index import delete_from_text_index

    root = str(tmp_path / "wh")
    eng = Engine(spark, root)
    eng.build_text_index(docs, "text", "doc_id", "docs",
                         meta_cols=["source"], positions=True)
    n_src7 = docs.where(F.col("source") == 'src7').count()
    idx = eng.delete_from_text_index("docs", predicate="source = 'src7'")
    assert idx.describe()["n_docs"] == docs.count() - n_src7
    rebuilt = build_text_index(
        docs.where(F.col("source") != 'src7'),
        "text", "doc_id", "d", str(tmp_path / "r"))
    assert idx.stats()[:2] == rebuilt.stats()[:2]
    with pytest.raises(ValueError, match="exactly one"):
        delete_from_text_index(
            spark, eng._text_index_dir(), "docs")

    rc = main(["--warehouse", root, "tindex", "search", "docs",
               "--terms", "table,hash", "--phrase", "--k", "3"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["results"] and "n_occurrences" in out["results"][0]
    rc = main(["--warehouse", root, "tindex", "search", "docs",
               "--terms", "table,join", "--near", "4", "--k", "3"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["results"] and "n_windows" in out["results"][0]
    rc = main(["--warehouse", root, "tindex", "search", "docs",
               "--terms", "dup,spark,merge", "--require-all"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert all(r["n_terms"] == 3 for r in out["results"])


def test_cli_describe_actions(spark, docs, tmp_path, capsys):
    import json as _json

    from queens_spark.cli import main
    from queens_spark.facade import Engine

    root = str(tmp_path / "wh")
    eng = Engine(spark, root)
    eng.build_text_index(docs, "text", "doc_id", "docs",
                         positions=True)
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    eng.build_vector_index(emb, "embedding", "vec_id", "vecs")
    rc = main(["--warehouse", root, "tindex", "describe", "docs"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["n_docs"] == docs.count() and out["positions"]
    rc = main(["--warehouse", root, "vindex", "describe", "vecs"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["name"] == "vecs" and out["segments"] == 1


def test_rarest_terms_selection(spark, docs, tmp_path):
    """df-ascending characteristic-term pick, deterministic ties;
    absent terms rank rarest (df 0)."""
    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir)
    idx = load_text_index(spark, idir, "d")
    from queens_spark.operators.corpus import term_frequencies

    df_all = {r["token"]: r["n"]
              for r in term_frequencies(docs, "text", "doc_id")
              .groupBy("token").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    cand = ["the", "dup", "spark", "merge", "table"]
    got = idx.rarest_terms(cand, 3)
    want = sorted(cand, key=lambda t: (df_all.get(t, 0), t))[:3]
    assert got == want
    assert idx.rarest_terms(["zzz_absent", "the"], 1) == ["zzz_absent"]
    with pytest.raises(ValueError, match="non-empty"):
        idx.rarest_terms([], 3)


def test_cli_batch_search(spark, docs, tmp_path, capsys):
    import json as _json

    from pyspark.sql import Row

    from queens_spark.cli import main
    from queens_spark.facade import Engine

    root = str(tmp_path / "wh")
    Engine(spark, root).build_text_index(docs, "text", "doc_id", "docs")
    qpath = str(tmp_path / "q.parquet")
    spark.createDataFrame([
        Row(query_id=1, terms=["dup", "spark"]),
        Row(query_id=2, terms=["merge"]),
    ]).write.parquet(qpath)
    rc = main(["--warehouse", root, "tindex", "search", "docs",
               "--queries", qpath, "--k", "3"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert {r["query_id"] for r in out["results"]} == {1, 2}
    assert len(out["results"]) == 6


def test_batch_more_like_this_matches_single(spark, docs, tmp_path):
    """The batch MLT block must agree per-query with the single-doc
    composition (rarest_terms + bm25_topk, self excluded)."""
    idir = str(tmp_path / "tidx")
    build_text_index(docs, "text", "doc_id", "d", idir)
    idx = load_text_index(spark, idir, "d")
    qids = [3, 7]
    got = {
        (r["query_id"], r["doc"], r["bm25_e5"], r["n_terms"])
        for r in idx.batch_more_like_this(
            docs, "text", qids, n_terms=4, k=6).collect()
    }
    want = set()
    for q in qids:
        terms_all = [r["t"] for r in
                     docs.where(F.col("doc_id") == q)
                     .select(F.explode(F.split("text", r"\s+"))
                             .alias("t"))
                     .where(F.col("t") != "").distinct().collect()]
        sel = idx.rarest_terms(terms_all, 4)
        rows = (idx.bm25_topk(sel, k=7)
                .where(F.col("doc") != q)
                .orderBy(F.desc("bm25_e5"), F.asc("doc")).limit(6)
                .collect())
        for r in rows:
            want.add((q, r["doc"], r["bm25_e5"], r["n_terms"]))
    assert got == want and got
    with pytest.raises(ValueError, match="non-empty"):
        idx.batch_more_like_this(docs, "text", [])


def test_property_index_equals_inline_bm25(spark, tmp_path):
    """Property check on random corpora: for any generated corpus and
    query-term subset, the stored-postings scorer equals the inline
    full-corpus scorer exactly — tf/dl/df/N/T and the rational-idf
    arithmetic agree end to end (fixed seeds: deterministic)."""
    import random

    from pyspark.sql import Row

    vocab = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = [
            Row(doc_id=i,
                text=" ".join(rng.choices(vocab,
                                          k=rng.randrange(1, 30))))
            for i in range(rng.randrange(5, 40))
        ]
        docs = spark.createDataFrame(rows)
        idir = str(tmp_path / f"t{seed}")
        # split build+append at a random point: segment layout must
        # not matter either
        cut = rng.randrange(1, len(rows))
        build_text_index(docs.where(F.col("doc_id") < cut),
                         "text", "doc_id", "d", idir)
        idx = append_text_index(docs.where(F.col("doc_id") >= cut),
                                "d", idir)
        terms = rng.sample(vocab, rng.randrange(1, 5))
        assert _rows(idx.bm25_topk(terms, k=50)) == _rows(
            bm25_topk(docs, "text", "doc_id", terms, k=50)
        ), (seed, terms)


def test_vocabulary_served_equals_inline(spark, docs, tmp_path):
    from queens_spark.operators.corpus import vocabulary

    idir = str(tmp_path / "tidx")
    build_text_index(docs.where(F.col("doc_id") < 250),
                     "text", "doc_id", "d", idir)
    idx = append_text_index(docs.where(F.col("doc_id") >= 250),
                            "d", idir)
    served = [(r["token"], r["n_occurrences"], r["n_docs"], r["rank"])
              for r in idx.vocabulary(top=50).collect()]
    inline = [(r["token"], r["n_occurrences"], r["n_docs"], r["rank"])
              for r in vocabulary(docs, "text", "doc_id",
                                  top=50).collect()]
    assert served == inline and served
    assert "Generate" not in plan_of(idx.vocabulary(top=50))


def test_token_stats_flags_stopwords(spark, tmp_path):
    """The hot-token audit (lexical twin of cell_stats): a stop-word-
    heavy corpus surfaces its stopwords with df ≈ N, and bucket_stats
    shows their buckets holding a disproportionate share."""
    from pyspark.sql import Row

    n = 60
    corpus = spark.createDataFrame([
        Row(doc_id=i,
            text=f"the and of document body{i} uniq{i} extra{i % 7}")
        for i in range(n)
    ])
    idx = build_text_index(corpus, "text", "doc_id", "s",
                           str(tmp_path / "t"))
    top = idx.token_stats(top=5).collect()
    assert [r["token"] for r in top[:4]] == ["and", "document", "of", "the"]
    assert all(r["df_docs"] == n for r in top[:4])
    assert [r["rank"] for r in top] == [1, 2, 3, 4, 5]
    # buckets of the stopwords dominate posting rows
    from queens_spark.store.text_index import token_bucket

    hot = {token_bucket(t, idx.n_buckets) for t in ("the", "and", "of")}
    bstats = {r["tok_bucket"]: r["n_postings"]
              for r in idx.bucket_stats().collect()}
    assert max(bstats[b] for b in hot) >= n


@pytest.mark.slow
def test_df_capped_build_exactness_contract(spark, tmp_path):
    """A max_df_ratio build drops stopword postings but keeps BM25 of
    SURVIVING terms bit-identical to the uncapped index (stats come
    from the pre-cap frame; surviving tf/dl/df rows are untouched).
    Appends apply the stored cap to their own batch; compaction
    preserves the exact pre-cap stats."""
    from pyspark.sql import Row

    def mk(lo, hi):
        return spark.createDataFrame([
            Row(doc_id=i,
                text=f"the the and document body{i} uniq{i} shared{i % 3}")
            for i in range(lo, hi)
        ])

    full = build_text_index(mk(0, 40), "text", "doc_id", "f",
                            str(tmp_path / "f"))
    capped = build_text_index(mk(0, 40), "text", "doc_id", "c",
                              str(tmp_path / "c"), max_df_ratio=0.5)
    # stats identical (pre-cap anchoring)
    assert capped.stats() == full.stats()
    # stopwords gone from the capped postings
    toks = {r["token"] for r in capped.postings().select("token")
            .distinct().collect()}
    assert "the" not in toks and "and" not in toks and "document" not in toks
    assert "shared0" in toks  # df = ~13 of 40 <= 0.5*40
    # surviving-term scores bit-identical
    q = ["shared0", "uniq5"]
    assert capped.bm25_topk(q, k=10).collect() == \
        full.bm25_topk(q, k=10).collect()
    # a capped-out term retrieves nothing (documented contract)
    assert capped.bm25_topk(["the", "uniq5"], k=10).count() == \
        full.bm25_topk(["uniq5"], k=10).count()

    # append applies the stored cap to ITS batch
    append_text_index(mk(40, 80), "c", str(tmp_path / "c"))
    append_text_index(mk(40, 80), "f", str(tmp_path / "f"))
    capped = load_text_index(spark, str(tmp_path / "c"), "c")
    full = load_text_index(spark, str(tmp_path / "f"), "f")
    assert capped.stats() == full.stats()
    toks = {r["token"] for r in capped.postings().select("token")
            .distinct().collect()}
    assert "the" not in toks
    assert capped.bm25_topk(q, k=10).collect() == \
        full.bm25_topk(q, k=10).collect()

    # compaction keeps the exact folded stats (written rows alone
    # cannot recover pre-cap N/T)
    before = capped.bm25_topk(q, k=10).collect()
    capped = compact_text_index(spark, str(tmp_path / "c"), "c")
    assert len(capped.entry["segments"]) == 1
    assert capped.stats() == full.stats()
    assert capped.bm25_topk(q, k=10).collect() == before

    # build_or_load: cap mismatch rebuilds
    idx2 = build_or_load_text_index(
        mk(0, 40), "text", "doc_id", "c", str(tmp_path / "c"),
        max_df_ratio=0.25,
    )
    assert idx2.entry["max_df_ratio"] == 0.25


def test_cli_stats_registry_maintain(spark, docs, tmp_path, capsys):
    """Shell surface for the round-10 operability verbs: tindex stats
    (hot-token audit), registry register/list/unregister, maintain."""
    from queens_spark.cli import main
    from queens_spark.facade import Engine

    root = str(tmp_path / "wh")
    eng = Engine(spark, root)
    eng.build_text_index(docs, "text", "doc_id", "docs")

    rc = main(["--warehouse", root, "tindex", "stats", "docs",
               "--top", "5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["hot_tokens"]) == 5
    assert out["hot_tokens"][0]["df_docs"] >= out["hot_tokens"][-1]["df_docs"]
    assert out["buckets"] > 1 and out["max_over_median"] >= 1

    rc = main(["--warehouse", root, "registry", "register", "docs",
               "--kind", "text", "--name", "docs"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["--warehouse", root, "registry", "list", "docs"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == [{"kind": "text", "name": "docs"}]
    rc = main(["--warehouse", root, "registry", "register", "docs"])
    assert rc == 2  # missing --kind/--name -> taxonomy error path
    capsys.readouterr()

    # maintain: nothing fragmented -> clean no-op report
    rc = main(["--warehouse", root, "maintain", "docs"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["compacted"] == ["text:docs"]
    assert out["ledger_segments_merged"] == 0

    rc = main(["--warehouse", root, "registry", "unregister", "docs",
               "--kind", "text", "--name", "docs"])
    assert rc == 0
    capsys.readouterr()
    rc = main(["--warehouse", root, "registry", "list", "docs"])
    assert rc == 0
    assert json.loads(
        capsys.readouterr().out.strip().splitlines()[-1]
    ) == []


def test_cli_df_capped_build(spark, docs, tmp_path, capsys):
    from queens_spark.cli import main

    root = str(tmp_path / "wh")
    src = str(tmp_path / "corpus.parquet")
    docs.select("doc_id", "text").write.parquet(src)
    rc = main(["--warehouse", root, "tindex", "build", "capped",
               "--source", src, "--max-df-ratio", "0.5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["built"] == "capped"
    from queens_spark.store.text_index import load_text_index

    idx = load_text_index(
        spark, os.path.join(root, "system", "text_index"), "capped"
    )
    assert idx.entry["max_df_ratio"] == 0.5
    # the true stopwords are gone from the hot-token audit
    top = idx.token_stats(top=3).collect()
    n = idx.stats()[0]
    assert all(r["df_docs"] <= 0.5 * n for r in top)


def test_snippet_topk_brute_force(spark, tmp_path):
    """snippet_topk == a python sliding-window reference on a corpus
    with KNOWN hit clusters; first-max-start tie convention; guards."""
    from pyspark.sql import Row

    corpus = spark.createDataFrame([
        # doc 1: cluster of 3 hits at positions 5,6,7
        Row(doc_id=1, text="a b c d e cat dog cat x y z w q r s t"),
        # doc 2: two spread hits (positions 0 and 12)
        Row(doc_id=2, text="cat b c d e f g h i j k l dog n o p"),
        # doc 3: no hits
        Row(doc_id=3, text="nothing to see here at all move along"),
    ])
    idx = build_text_index(corpus, "text", "doc_id", "s",
                           str(tmp_path / "t"), positions=True)
    out = idx.snippet_topk(["cat", "dog"], k=5, window=4).collect()
    assert [(r["doc"], r["window_start"], r["n_hits"]) for r in out] == [
        (1, 5, 3),   # window [5,9) covers cat dog cat
        (2, 0, 1),   # spread hits: best any single, first start wins
    ]
    # a window large enough to cover doc 2's both hits
    out = idx.snippet_topk(["cat", "dog"], k=5, window=13).collect()
    assert [(r["doc"], r["n_hits"]) for r in out] == [(1, 3), (2, 2)]

    with pytest.raises(ValueError, match="non-empty"):
        idx.snippet_topk([])
    with pytest.raises(ValueError, match="window"):
        idx.snippet_topk(["cat"], window=0)
    flat = build_text_index(corpus, "text", "doc_id", "f",
                            str(tmp_path / "f"))  # no positions
    with pytest.raises(ValueError, match="positional"):
        flat.snippet_topk(["cat"])


def test_boosted_bm25_prior_weighting(spark, docs, tmp_path):
    """Document-prior boosting: integer weights reorder the ranking
    deterministically, unit weights degenerate to plain BM25, and the
    plan never touches the corpus (source rides the postings)."""
    idir = str(tmp_path / "t")
    idx = build_text_index(docs, "text", "doc_id", "d", idir,
                           meta_cols=["source"])
    plain = idx.bm25_topk(TERMS, k=10).collect()
    unit = idx.boosted_bm25_topk(TERMS, "source", {}, k=10).collect()
    assert [(r["doc"], r["bm25_e5"]) for r in unit] == \
        [(r["doc"], r["bm25_e5"]) for r in plain]
    assert all(r["boosted_e5"] == r["bm25_e5"] for r in unit)

    boosted = idx.boosted_bm25_topk(
        TERMS, "source", {"src3": 100}, k=10).collect()
    # every src3 doc in the pool outranks every non-boosted doc
    srcs = {r["doc_id"]: r["source"]
            for r in docs.select("doc_id", "source").collect()}
    ranks = [srcs[r["doc"]] for r in boosted]
    first_plain = next(
        (i for i, s in enumerate(ranks) if s != "src3"), len(ranks)
    )
    assert "src3" not in ranks[first_plain:]
    assert first_plain >= 1  # the boost actually promoted src3 docs
    assert all(
        r["boosted_e5"] == r["bm25_e5"] * (100 if srcs[r["doc"]] == "src3"
                                           else 1)
        for r in boosted
    )
    plan = plan_of(idx.boosted_bm25_topk(TERMS, "source", {"src3": 2}))
    assert "documents.parquet" not in plan and "Generate" not in plan

    with pytest.raises(ValueError, match="positive integers"):
        idx.boosted_bm25_topk(TERMS, "source", {"src3": 0})
    with pytest.raises(ValueError, match="positive integers"):
        idx.boosted_bm25_topk(TERMS, "source", {"src3": 1.5})
    with pytest.raises(ValueError, match="meta_cols"):
        idx.boosted_bm25_topk(TERMS, "lang", {"en": 2})
    with pytest.raises(ValueError, match="envelope"):
        idx.boosted_bm25_topk(TERMS, "source", {"src3": 2**40})


def test_resolve_terms_and_corrected_bm25(spark, tmp_path):
    """Typo tolerance: indexed terms resolve to themselves, typos to
    the (dist ASC, df DESC, token ASC) vocabulary winner, junk to
    None; corrected scores equal plain BM25 on the corrected query."""
    from pyspark.sql import Row

    corpus = spark.createDataFrame([
        Row(doc_id=0, text="shuffle exchange partition broadcast"),
        Row(doc_id=1, text="shuffle shuffle partition skew salt"),
        Row(doc_id=2, text="scuffle boots and a partition wall"),
        Row(doc_id=3, text="broadcast join hint threshold"),
    ])
    idx = build_text_index(corpus, "text", "doc_id", "d",
                           str(tmp_path / "t"))
    res = idx.resolve_terms(["partition", "shufle", "zzzzzzzz"])
    # 'shufle' is dist-1 from both 'shuffle' (df 2) and 'scuffle'
    # (df 1): df breaks the tie
    assert res == {"partition": "partition", "shufle": "shuffle",
                   "zzzzzzzz": None}

    got = idx.corrected_bm25_topk(["shufle", "partition"], k=4).collect()
    want = idx.bm25_topk(["shuffle", "partition"], k=4).collect()
    assert got == want
    with pytest.raises(ValueError, match="no query terms resolve"):
        idx.corrected_bm25_topk(["zzzzzzzz"], k=3)
    with pytest.raises(ValueError, match="max_dist"):
        idx.resolve_terms(["x"], max_dist=0)


def test_facet_counts_matches_inline_and_modes(spark, docs, tmp_path):
    """Facet histograms must equal a direct tokenize computation on
    the corpus, in both any-term and require_all modes, and compose
    with metadata predicates."""
    idir = str(tmp_path / "tidx_facet")
    build_text_index(
        docs, "text", "doc_id", "d", idir, meta_cols=["source", "lang"]
    )
    idx = load_text_index(spark, idir, "d")
    terms = ["dup", "merge"]

    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda x: x != "")
    exploded = docs.select(
        "doc_id", "source", F.explode(toks).alias("t")
    ).where(F.col("t").isin(terms))

    def expect(require_all: bool):
        per_doc = exploded.groupBy("doc_id", "source").agg(
            F.count_distinct("t").alias("nt")
        )
        if require_all:
            per_doc = per_doc.where(F.col("nt") == len(terms))
        return {
            (r["source"], r["n_docs"])
            for r in per_doc.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"))
            .collect()
        }

    for ra in (False, True):
        got = {
            (r["source"], r["n_docs"])
            for r in idx.facet_counts(terms, "source", require_all=ra).collect()
        }
        assert got == expect(ra), ra

    # predicate-restricted facets: only en docs counted
    got_en = {
        (r["source"], r["n_docs"])
        for r in idx.facet_counts(terms, "source", predicate="lang = 'en'").collect()
    }
    en_docs = {r["doc_id"] for r in docs.where("lang = 'en'").collect()}
    per_doc = exploded.groupBy("doc_id", "source").count().collect()
    exp = {}
    for r in per_doc:
        if r["doc_id"] in en_docs:
            exp[r["source"]] = exp.get(r["source"], 0) + 1
    assert got_en == set(exp.items())

    with pytest.raises(ValueError, match="meta_cols"):
        idx.facet_counts(terms, "n_chars")


def test_facet_counts_plan_is_bucket_pruned_zero_corpus(spark, docs, tmp_path):
    idir = str(tmp_path / "tidx_facet_plan")
    build_text_index(
        docs, "text", "doc_id", "d", idir, meta_cols=["source"]
    )
    idx = load_text_index(spark, idir, "d")
    plan = plan_of(idx.facet_counts(["dup", "merge"], "source"))
    assert "PartitionFilters" in plan and "tok_bucket" in plan
    assert "Generate" not in plan
    assert "documents.parquet" not in plan


def test_cli_facet_search(spark, docs, tmp_path, capsys):
    import json as _json

    from queens_spark.cli import main
    from queens_spark.facade import Engine

    root = str(tmp_path / "wh")
    eng = Engine(spark, root)
    eng.build_text_index(
        docs, "text", "doc_id", "docs", meta_cols=["source"]
    )
    rc = main(["--warehouse", root, "tindex", "search", "docs",
               "--terms", "dup,merge", "--facet", "source"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    got = {(r["facet_value"], r["n_docs"]) for r in out["results"]}
    idx = eng.text_index("docs")
    exp = {(r["source"], r["n_docs"])
           for r in idx.facet_counts(["dup", "merge"], "source").collect()}
    assert got == exp and got
