"""Command-line interface (stdlib argparse — no Typer dependency).

Parity with the reference CLI's command set (queens/cli.py:66-279):
ingest, stage, query, metadata, versions, info, export.
"""

from __future__ import annotations

import argparse
import json
import sys

from queens_spark.facade import Engine
from queens_spark.session import get_spark
from queens_spark.settings import (
    DEFAULT_LIMIT,
    current_config,
    ensure_user_configs,
    resolve_export_dir,
    resolve_warehouse,
    set_config,
)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="queens-spark",
        description="PySpark-native QUEENS-compatible analytics engine",
    )
    p.add_argument("--warehouse", default=None,
                   help="warehouse root (default: $QUEENS_SPARK_WAREHOUSE, "
                        "then config.ini, then ~/.queens_spark/warehouse)")
    sub = p.add_subparsers(dest="command", required=True)

    q = sub.add_parser("query", help="query a staged table with the filter DSL")
    q.add_argument("collection")
    q.add_argument("table_name")
    q.add_argument("--filters", default=None, help="JSON filter DSL")
    q.add_argument("--limit", type=int, default=DEFAULT_LIMIT)
    q.add_argument("--cursor", type=int, default=None)

    st = sub.add_parser("stage", help="rebuild the prod snapshot")
    st.add_argument("collection")
    st.add_argument("--as-of", default=None, help="YYYY-MM-DD cutoff")

    cp = sub.add_parser(
        "compact",
        help="rewrite fragmented prod (or raw) partitions into few "
             "large files",
    )
    cp.add_argument("collection")
    cp.add_argument("--target-files", type=int, default=1)
    cp.add_argument("--which", choices=["prod", "raw"], default="prod",
                    help="compact the staged snapshot (default) or the "
                         "append-only raw table")

    for name in ("metadata", "versions", "info"):
        s = sub.add_parser(name, help=f"show {name} for a collection")
        s.add_argument("collection")
        s.add_argument("--table-name", default=None)

    ex = sub.add_parser("export", help="export staged tables")
    ex.add_argument("collection")
    ex.add_argument("file_type", choices=["csv", "parquet", "jsonl", "xlsx", "orc"])
    ex.add_argument("output_path", nargs="?", default=None,
                    help="destination dir (default: the configured "
                         "export dir — `config --export-path`)")
    ex.add_argument("--table-name", default=None)
    ex.add_argument("--bulk", action="store_true")

    cf = sub.add_parser(
        "config",
        help="show or persist user configuration "
             "(reference queens/cli.py:41-66)",
    )
    cf.add_argument("--show-current", action="store_true")
    cf.add_argument("--warehouse-path", default=None,
                    help="persist a warehouse root to config.ini")
    cf.add_argument("--export-path", default=None,
                    help="persist a default export dir to config.ini")

    ing = sub.add_parser(
        "ingest", help="ingest a configured table from a local workbook"
    )
    ing.add_argument("collection")
    ing.add_argument("table")
    ing.add_argument("--workbook", required=True, help="local .xlsx path")
    ing.add_argument("--etl-config", default=None,
                     help="etl_config.json path (default: the per-user "
                          "config dir, bootstrapped from packaged defaults)")
    ing.add_argument("--template", default=None,
                     help="template table as parquet (row,label,dims...)")
    ing.add_argument("--url", default=None, help="provenance URL for the log")

    init = sub.add_parser(
        "init", help="bootstrap the warehouse system stores + user configs"
    )
    init.add_argument("--collection", action="append", default=None)

    sv = sub.add_parser("serve", help="run the HTTP API (requires fastapi)")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8000)

    vx = sub.add_parser(
        "vindex",
        help="warehouse vector-index lifecycle: build/append/compact/"
             "search over a parquet corpus of (id, vector) rows",
    )
    vx.add_argument("action",
                    choices=["build", "append", "compact", "search",
                             "delete", "retrain", "describe", "stats"])
    vx.add_argument("name", help="index name in the warehouse manifest")
    vx.add_argument("--source", default=None,
                    help="corpus parquet path (build/append; search "
                         "uses it to fetch the query vector)")
    vx.add_argument("--vec-col", default="embedding")
    vx.add_argument("--id-col", default="vec_id")
    vx.add_argument("--cells-every", type=int, default=None,
                    help="build an IVF coarse quantizer from every Nth "
                         "id (enables ivfpq search)")
    vx.add_argument("--coarse-iters", type=int, default=0,
                    help="train the IVF cells with N integer Lloyd "
                         "rounds (fixes seed-cell skew)")
    vx.add_argument("--meta-cols", default=None,
                    help="comma-separated metadata columns to co-locate "
                         "with the codes (enables --where)")
    vx.add_argument("--query-id", type=int, default=None,
                    help="search: id (in --source) whose vector is the "
                         "query")
    vx.add_argument("--k", type=int, default=10)
    vx.add_argument("--n-probe", type=int, default=2)
    vx.add_argument("--where", default=None,
                    help="search/delete: SQL predicate over --meta-cols")
    vx.add_argument("--ids", default=None,
                    help="delete: comma-separated ids to tombstone")

    tx = sub.add_parser(
        "tindex",
        help="warehouse text-index lifecycle: build/append/compact/"
             "search (BM25) over a parquet corpus of (id, text) rows",
    )
    tx.add_argument("action",
                    choices=["build", "append", "compact", "search",
                             "delete", "describe", "stats"])
    tx.add_argument("name", help="index name in the warehouse manifest")
    tx.add_argument("--source", default=None,
                    help="corpus parquet path (build/append only — "
                         "search reads stored postings exclusively)")
    tx.add_argument("--text-col", default="text")
    tx.add_argument("--id-col", default="doc_id")
    tx.add_argument("--n-buckets", type=int, default=None,
                    help="token-hash bucket count (build only)")
    tx.add_argument("--terms", default=None,
                    help="search: comma-separated query terms")
    tx.add_argument("--queries", default=None,
                    help="search: parquet of (query_id, terms "
                         "array<string>) — batch BM25, one postings "
                         "scan for the whole block")
    tx.add_argument("--ids", default=None,
                    help="delete: comma-separated doc ids to tombstone")
    tx.add_argument("--where", default=None,
                    help="search/delete: SQL predicate over the index's "
                         "meta_cols")
    tx.add_argument("--phrase", action="store_true",
                    help="search: treat --terms as an exact phrase "
                         "(needs a positions=True index)")
    tx.add_argument("--near", type=int, default=None,
                    help="search: proximity window — all terms within "
                         "N tokens (needs a positions=True index)")
    tx.add_argument("--fuzzy", type=int, default=None,
                    help="search: typo-tolerant BM25 — resolve unknown "
                         "terms against the index vocabulary within "
                         "this Levenshtein distance")
    tx.add_argument("--snippet", type=int, default=None,
                    help="search: best-window snippet mode — rank docs "
                         "by query-term hits in an N-token span "
                         "(needs a positions=True index)")
    tx.add_argument("--require-all", action="store_true",
                    help="search: conjunctive (AND) BM25")
    tx.add_argument("--facet", default=None,
                    help="search: facet histogram — matching-doc "
                         "counts per value of this meta_cols column "
                         "over the WHOLE candidate pool")
    tx.add_argument("--meta-cols", default=None,
                    help="build: comma-separated metadata columns to "
                         "denormalize onto the postings")
    tx.add_argument("--positions", action="store_true",
                    help="build: store token positions (enables "
                         "--phrase / --near)")
    tx.add_argument("--max-df-ratio", type=float, default=None,
                    help="build: df-cap — drop tokens appearing in "
                         "more than RATIO of a segment's docs "
                         "(stopword pruning; surviving-term BM25 "
                         "stays exact)")
    tx.add_argument("--top", type=int, default=20,
                    help="stats: how many hot tokens to report")
    tx.add_argument("--k", type=int, default=10)

    mt = sub.add_parser(
        "maintain",
        help="one-call storage sweep for a collection's retrieval "
             "stack: pending-token gate, ledger + registered-index "
             "compaction (token bookkeeping cleared), IVF rebalance",
    )
    mt.add_argument("collection")
    mt.add_argument("--ledger", default=None,
                    help="dedup ledger name (default: the collection)")
    mt.add_argument("--corpus", default=None,
                    help="indexed corpus parquet — enables the IVF "
                         "skew rebalance step")

    sk = sub.add_parser(
        "skstore",
        help="persisted KMV sketch store: build/append over a parquet "
             "source of (group, key) rows; distinct/overlap served "
             "from the stored k-rows with no corpus touch",
    )
    sk.add_argument("action",
                    choices=["build", "append", "describe", "distinct",
                             "overlap"])
    sk.add_argument("name", help="store name in the warehouse manifest")
    sk.add_argument("--source", default=None,
                    help="parquet path (build/append)")
    sk.add_argument("--group-col", default="source")
    sk.add_argument("--key-col", default=None,
                    help="bigint key column to sketch (build)")
    sk.add_argument("--k", type=int, default=64)
    sk.add_argument("--token", default=None,
                    help="append: idempotency token (replay no-ops)")

    cmp_ = sub.add_parser(
        "cmap",
        help="stored dedup cluster map: build over a parquet corpus, "
             "append new batches O(batch) (bit-identical to a rebuild "
             "at the frozen params), serve members/canonical/edges "
             "with no corpus touch",
    )
    cmp_.add_argument("action",
                      choices=["build", "append", "retire", "describe",
                               "members", "canonical", "edges"])
    cmp_.add_argument("name", help="map name in the warehouse")
    cmp_.add_argument("--source", default=None,
                      help="parquet path (build/append)")
    cmp_.add_argument("--text-col", default="text")
    cmp_.add_argument("--id-col", default="doc_id")
    cmp_.add_argument("--n", type=int, default=3,
                      help="shingle size (build)")
    cmp_.add_argument("--threshold", type=float, default=0.8,
                      help="Jaccard threshold (build)")
    cmp_.add_argument("--max-df", default="auto",
                      help="stop-shingle cap (build; frozen for appends)")
    cmp_.add_argument("--token", default=None,
                      help="append: idempotency token (replay no-ops)")
    cmp_.add_argument("--ids", default=None,
                      help="retire: comma-separated doc ids — members/"
                           "canonical/edges re-serve exactly a rebuild "
                           "on the survivors; retired ids may "
                           "re-append (the revision route)")
    cmp_.add_argument("--limit", type=int, default=20,
                      help="rows printed by members/canonical/edges")

    ec = sub.add_parser(
        "ecdf",
        help="persisted mergeable ECDF profile: build/append a "
             "per-group fixed-grid histogram-CDF over a parquet "
             "source; percentile thresholds, the CDF table, and the "
             "drift matrix serve from the stored counters with no "
             "corpus touch",
    )
    ec.add_argument("action",
                    choices=["build", "append", "describe", "cdf",
                             "thresholds", "drift"])
    ec.add_argument("name", help="store name in the warehouse manifest")
    ec.add_argument("--source", default=None,
                    help="parquet path (build/append)")
    ec.add_argument("--group-col", default="source")
    ec.add_argument("--value-sql", default=None,
                    help="Spark-SQL value expression (build)")
    ec.add_argument("--width", type=int, default=50)
    ec.add_argument("--n-buckets", type=int, default=40)
    ec.add_argument("--bp", default="2500,5000,9000",
                    help="thresholds: comma-separated basis points")
    ec.add_argument("--token", default=None,
                    help="append: idempotency token (replay no-ops)")
    ec.add_argument("--profiles", default=None,
                    help="build: JSON {name: {value_sql, width, "
                         "n_buckets}} — multi-profile store built in "
                         "ONE corpus scan (overrides --value-sql)")
    ec.add_argument("--profile", default=None,
                    help="cdf/thresholds/drift: profile name on a "
                         "multi-profile store")

    fs = sub.add_parser(
        "fsck",
        help="read-only consistency audit of the retrieval storage "
             "tier (indexes, ledgers, registry) — zero Spark jobs, "
             "nothing mutated; exit code 1 on errors",
    )
    fs.add_argument("--quiet", action="store_true",
                    help="print only the summary line")

    stt = sub.add_parser(
        "status",
        help="per-store freshness audit for a collection's registered "
             "indexes (version, segments, pending idempotency tokens) "
             "— pure manifest reads, zero Spark jobs; exit code 1 "
             "when any store is stale",
    )
    stt.add_argument("collection")
    stt.add_argument("--ledger", default=None,
                     help="ledger name (default: the collection)")

    rp = sub.add_parser(
        "report",
        help="one-verb corpus release report over a parquet corpus: "
             "filter-cascade funnel, exact-dup rate, vocabulary head, "
             "per-source composition",
    )
    rp.add_argument("corpus", help="parquet path of the corpus table")
    rp.add_argument("--text-col", default="text")
    rp.add_argument("--id-col", default="doc_id")
    rp.add_argument("--source-col", default=None)
    rp.add_argument("--vocab-top", type=int, default=20)

    rt = sub.add_parser(
        "retire",
        help="take documents down across the whole retrieval stack: "
             "tombstone every registered index AND retire the ledger "
             "fingerprints (equivalent content may re-enter later)",
    )
    rt.add_argument("collection")
    rt.add_argument("--ids", default=None,
                    help="comma-separated doc ids to retire")
    rt.add_argument("--where", default=None,
                    help="retire by metadata instead: SQL predicate "
                         "over a registered text index's meta_cols, "
                         "or over the collection's own warehouse "
                         "columns when no text index is registered "
                         "(retention/expiry flows)")
    rt.add_argument("--id-col", default=None,
                    help="document id column for --where when no "
                         "registered store declares it")
    rt.add_argument("--ledger", default=None,
                    help="dedup ledger name (default: the collection)")
    rt.add_argument("--block", action="store_true",
                    help="also blocklist the retired fingerprints so "
                         "equivalent content can never re-enter")
    rt.add_argument("--block-near", type=float, default=None,
                    help="with --block on a minhash ledger: also ban "
                         "NEAR-duplicates at this lane-agreement "
                         "threshold (0..1)")

    bl = sub.add_parser(
        "block",
        help="pre-emptively ban content by raw text on a collection's "
             "dedup ledger (optionally near-duplicates too)",
    )
    bl.add_argument("collection")
    bl.add_argument("--text", action="append", required=True,
                    help="text to ban (repeatable)")
    bl.add_argument("--near", type=float, default=None,
                    help="also ban near-duplicates at this "
                         "lane-agreement threshold (0..1)")
    bl.add_argument("--ledger", default=None)

    ie = sub.add_parser(
        "index-export",
        help="ship a stored index as a self-contained relocatable "
             "bundle (promote/backup: artifacts, never a rebuild)",
    )
    ie.add_argument("kind", choices=["text", "vector"])
    ie.add_argument("name")
    ie.add_argument("dest")

    ii = sub.add_parser(
        "index-import",
        help="install an exported index bundle into this warehouse "
             "(tree copies first, manifest flips last)",
    )
    ii.add_argument("src")
    ii.add_argument("--name", default=None,
                    help="install under a different name")

    tr = sub.add_parser(
        "trun",
        help="training-run lifecycle: pack a corpus into fixed-length "
             "sharded sequences, verify shard checksums, inspect the "
             "manifest, preview a seed's epoch order",
    )
    tr.add_argument(
        "action", choices=["build", "verify", "describe", "epoch"]
    )
    tr.add_argument("name", help="run name under the warehouse")
    tr.add_argument("--corpus", default=None,
                    help="(build) parquet path of the document corpus")
    tr.add_argument("--text-col", default="text")
    tr.add_argument("--id-col", default="doc_id")
    tr.add_argument("--stratum-col", default=None,
                    help="(build) pack within this column's strata")
    tr.add_argument("--seq-len", type=int, default=2048)
    tr.add_argument("--n-shards", type=int, default=16)
    tr.add_argument("--seed", default="epoch-0",
                    help="(epoch) deterministic shuffle seed")
    tr.add_argument("--head", type=int, default=10,
                    help="(epoch) rows to preview")

    ru = sub.add_parser(
        "rollup",
        help="incrementally-maintained GROUP-BY rollups: register "
             "once, every ingest folds its batch in, serve without "
             "scanning raw (latest-wins correct, as_of time travel)",
    )
    ru.add_argument("action", choices=["register", "serve", "list"])
    ru.add_argument("collection")
    ru.add_argument("name", nargs="?", default=None)
    ru.add_argument("--keys", default=None,
                    help="(register) comma-separated GROUP BY columns")
    ru.add_argument("--values", default=None,
                    help="(register) comma-separated value columns")
    ru.add_argument("--as-of", default=None,
                    help="(serve) snapshot cutoff YYYY-MM-DD")

    rg = sub.add_parser(
        "registry",
        help="which stored indexes a collection's ingests keep fresh "
             "(auto-refresh inside Engine.ingest / stream ingestion)",
    )
    rg.add_argument("action", choices=["register", "unregister", "list"])
    rg.add_argument("collection")
    rg.add_argument("--kind", choices=["text", "vector"], default=None)
    rg.add_argument("--name", default=None)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return _run(args)
    except (KeyError, NameError, ValueError, TypeError, json.JSONDecodeError) as exc:
        print(f"error: {exc}", file=sys.stderr)
        return 2


def _run(args) -> int:
    # `config` is pure driver-side bookkeeping — no Spark session.
    if args.command == "config":
        if args.show_current:
            cfg = ensure_user_configs()
            for k, v in current_config(cfg).items():
                print(f"{k}: {v}")
            return 0
        if not (args.warehouse_path or args.export_path):
            print("Nothing to change. Use --warehouse-path and/or "
                  "--export-path, or --show-current.")
            return 0
        ini = set_config(args.warehouse_path, args.export_path)
        print(f"Configuration updated: {ini}")
        return 0
    if args.command == "serve":
        # Gated import BEFORE paying session startup: in slim runtimes
        # (this one) fastapi/uvicorn are absent — fail with the
        # documented remediation instead of a traceback.
        try:
            import uvicorn  # noqa: F401
            from fastapi import FastAPI  # noqa: F401
        except ImportError:
            print(
                "error: `serve` requires fastapi and uvicorn, which are "
                "not installed; use QueryService (queens_spark.api) "
                "directly or install the extras",
                file=sys.stderr,
            )
            return 2

    spark = get_spark("queens_spark_cli")
    spark.sparkContext.setLogLevel("ERROR")
    engine = Engine(spark, resolve_warehouse(args.warehouse))

    if args.command == "query":
        filters = json.loads(args.filters) if args.filters else None
        records, next_cursor = engine.query_page(
            args.collection, args.table_name, filters,
            limit=args.limit, cursor=args.cursor,
        )
        json.dump({"data": records, "next_cursor": next_cursor},
                  sys.stdout, default=str, indent=2)
        print()
    elif args.command == "stage":
        staged = engine.stage(args.collection, as_of=args.as_of)
        print(json.dumps({"staged_tables": staged}))
    elif args.command == "compact":
        report = engine.compact(args.collection, args.target_files,
                                args.which)
        print(json.dumps({
            "compacted": {t: {"files_before": b, "files_after": a}
                          for t, (b, a) in report.items()}
        }))
    elif args.command == "metadata":
        df = engine.get_metadata(args.collection, args.table_name)
        print(df.toPandas().to_string(index=False))
    elif args.command == "versions":
        df = engine.get_versions(args.collection, args.table_name)
        print(df.toPandas().to_string(index=False))
    elif args.command == "info":
        print(engine.get_data_info(args.collection).toPandas().to_string(index=False))
    elif args.command == "export":
        from queens_spark.sources.export import export_all, export_table

        out_dir = resolve_export_dir(args.output_path)
        if args.table_name:
            out = [export_table(engine, args.collection, args.file_type,
                                args.table_name, out_dir)]
        else:
            out = export_all(engine, args.collection, args.file_type,
                             out_dir, bulk_export=args.bulk)
        print(json.dumps({"exported": out}))
    elif args.command == "ingest":
        from queens_spark.etl.process import ingest_table, load_etl_config
        from queens_spark.settings import load_configs

        if args.etl_config:
            etl_config = load_etl_config(args.etl_config)
        else:
            etl_config = load_configs()["etl_config"]
        templates = None
        if args.template:
            templates = {args.table: spark.read.parquet(args.template)}
        result = ingest_table(
            engine, args.collection, args.table,
            workbook_path=args.workbook,
            etl_config=etl_config,
            templates=templates,
            url=args.url,
        )
        print(json.dumps({"ingested": result}))
    elif args.command == "init":
        from queens_spark.etl.process import initialize

        cfg_dir = ensure_user_configs()
        created = initialize(engine, args.collection)
        print(json.dumps({"config_dir": cfg_dir, "created": created}))
    elif args.command == "vindex":
        return _run_vindex(spark, engine, args)
    elif args.command == "tindex":
        return _run_tindex(spark, engine, args)
    elif args.command == "maintain":
        corpus = (
            spark.read.parquet(args.corpus) if args.corpus else None
        )
        print(json.dumps(engine.maintain(
            args.collection, corpus_df=corpus, ledger=args.ledger,
        )))
    elif args.command == "skstore":
        return _run_skstore(spark, engine, args)
    elif args.command == "cmap":
        return _run_cmap(spark, engine, args)
    elif args.command == "ecdf":
        return _run_ecdf(spark, engine, args)
    elif args.command == "fsck":
        rep = engine.fsck()
        if args.quiet:
            rep = {k: v for k, v in rep.items() if k != "findings"}
        print(json.dumps(rep))
        return 0 if rep["healthy"] else 1
    elif args.command == "status":
        rep = engine.status(args.collection, ledger=args.ledger)
        print(json.dumps(rep))
        return 1 if rep["stale_stores"] else 0
    elif args.command == "report":
        rep = engine.corpus_report(
            spark.read.parquet(args.corpus),
            args.text_col,
            args.id_col,
            source_col=args.source_col,
            vocab_top=args.vocab_top,
        )
        print(json.dumps({
            name: [r.asDict() for r in frame.collect()]
            for name, frame in rep.items()
        }))
    elif args.command == "retire":
        print(json.dumps(engine.retire_documents(
            args.collection,
            ids=(
                [int(x) for x in args.ids.split(",") if x]
                if args.ids else None
            ),
            predicate=args.where,
            id_col=args.id_col,
            ledger=args.ledger,
            block=args.block,
            block_near_threshold=args.block_near,
        )))
    elif args.command == "block":
        print(json.dumps({
            "blocked": engine.block_texts(
                args.collection, args.text,
                near_threshold=args.near, ledger=args.ledger,
            ),
            "collection": args.collection,
        }))
    elif args.command == "index-export":
        print(json.dumps({
            "exported": args.name, "kind": args.kind,
            "dest": engine.export_index(args.kind, args.name, args.dest),
        }))
    elif args.command == "index-import":
        print(json.dumps({
            "imported": engine.import_index(args.src, name=args.name),
        }))
    elif args.command == "trun":
        if args.action == "build":
            if not args.corpus:
                raise ValueError("trun build requires --corpus")
            run = engine.export_training_run(
                spark.read.parquet(args.corpus),
                args.text_col, args.id_col, args.name,
                seq_len=args.seq_len, n_shards=args.n_shards,
                stratum_col=args.stratum_col,
            )
            print(json.dumps(run.entry, sort_keys=True))
        elif args.action == "verify":
            out = engine.training_run(args.name).verify()
            print(json.dumps(out, sort_keys=True))
            if any(v != "ok" for v in out.values()):
                return 1
        elif args.action == "describe":
            print(json.dumps(
                engine.training_run(args.name).manifest, sort_keys=True
            ))
        else:  # epoch
            rows = (
                engine.training_run(args.name)
                .epoch(args.seed)
                .drop("toks", "doc_spans")
                .limit(args.head)
                .collect()
            )
            print(json.dumps([r.asDict() for r in rows]))
    elif args.command == "rollup":
        if args.action == "list":
            from queens_spark.store.rollup import registered_rollups

            print(json.dumps(
                registered_rollups(engine._rollups_dir(), args.collection),
                sort_keys=True,
            ))
        elif args.action == "register":
            if not (args.name and args.keys and args.values):
                raise ValueError(
                    "rollup register requires NAME, --keys and --values"
                )
            spec = engine.register_rollup(
                args.collection, args.name,
                [k.strip() for k in args.keys.split(",") if k.strip()],
                [v.strip() for v in args.values.split(",") if v.strip()],
            )
            print(json.dumps({"registered": args.name, **spec}))
        else:  # serve
            if not args.name:
                raise ValueError("rollup serve requires NAME")
            df = engine.rollup(args.collection, args.name, as_of=args.as_of)
            for row in df.orderBy(*df.columns[:1]).collect():
                print(json.dumps(row.asDict(), default=str))
    elif args.command == "registry":
        if args.action == "list":
            print(json.dumps(engine.registered_indexes(args.collection)))
        else:
            if not (args.kind and args.name):
                raise ValueError(
                    f"registry {args.action} requires --kind and --name"
                )
            if args.action == "register":
                engine.register_index(args.collection, args.kind, args.name)
            else:
                engine.unregister_index(
                    args.collection, args.kind, args.name
                )
            print(json.dumps({
                args.action: f"{args.kind}:{args.name}",
                "collection": args.collection,
            }))
    elif args.command == "serve":
        import uvicorn

        from queens_spark.api import create_app

        uvicorn.run(create_app(engine), host=args.host, port=args.port)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())


def _run_vindex(spark, engine, args) -> int:
    """`vindex` subcommand: the stored-index lifecycle from the shell.
    build/append read a parquet corpus; search serves purely from the
    stored artifacts (the query vector is the only --source touch)."""
    from pyspark.sql import functions as F

    name = args.name
    meta = args.meta_cols.split(",") if args.meta_cols else None

    def corpus():
        if not args.source:
            raise ValueError(f"vindex {args.action} requires --source")
        return spark.read.parquet(args.source)

    if args.action == "build":
        df = corpus()
        kw = {}
        if args.cells_every:
            kw["centroid_ids"] = [
                r[0]
                for r in df.where(
                    F.col(args.id_col) % args.cells_every == 0
                ).select(args.id_col).collect()
            ]
        if meta:
            kw["meta_cols"] = meta
        if args.coarse_iters:
            kw["coarse_iters"] = args.coarse_iters
        from queens_spark.store.vector_index import source_fingerprint

        idx = engine.build_vector_index(
            df, args.vec_col, args.id_col, name,
            fingerprint=source_fingerprint(args.source), **kw,
        )
        print(json.dumps({
            "built": name,
            "version": idx.entry["version"],
            "ivf_cells": len(idx.entry.get("centroid_ids") or []),
            "meta_cols": idx.entry.get("meta_cols"),
        }))
    elif args.action == "append":
        from queens_spark.store.vector_index import source_fingerprint

        idx = engine.append_vector_index(
            corpus(), name, fingerprint=source_fingerprint(args.source)
        )
        print(json.dumps({
            "appended": name,
            "segments": len(
                idx.entry["pq_codes_path"]
                if isinstance(idx.entry["pq_codes_path"], list) else [0]
            ),
        }))
    elif args.action == "compact":
        import os as _os

        from queens_spark.store.vector_index import compact_vector_index

        idx = compact_vector_index(
            spark,
            _os.path.join(engine.warehouse.root, "system", "vector_index"),
            name,
        )
        print(json.dumps({"compacted": name,
                          "version": idx.entry["version"]}))
    elif args.action == "describe":
        print(json.dumps(engine.vector_index(name).describe()))
    elif args.action == "stats":
        idx = engine.vector_index(name)
        sizes = sorted(
            int(r["n_vectors"]) for r in idx.cell_stats().collect()
        )
        med = sizes[len(sizes) // 2] if sizes else 0
        print(json.dumps({
            "name": name,
            "cells": len(sizes),
            "max_cell_vectors": sizes[-1] if sizes else 0,
            "median_cell_vectors": med,
            "max_over_median": (
                round(sizes[-1] / med, 2) if med else None
            ),
        }))
    elif args.action == "retrain":
        import os as _os

        from queens_spark.store.vector_index import (
            retrain_coarse_quantizer,
        )

        idx = retrain_coarse_quantizer(
            corpus(), name,
            _os.path.join(engine.warehouse.root, "system", "vector_index"),
            coarse_iters=args.coarse_iters or 1,
        )
        print(json.dumps({
            "retrained": name,
            "version": idx.entry["version"],
            "coarse_iters": idx.describe()["coarse_iters"],
        }))
    elif args.action == "delete":
        if (args.ids is None) == (args.where is None):
            raise ValueError(
                "vindex delete requires exactly one of --ids/--where"
            )
        idx = engine.delete_from_vector_index(
            name,
            ids=(
                [int(x) for x in args.ids.split(",") if x]
                if args.ids else None
            ),
            predicate=args.where,
        )
        print(json.dumps({
            "deleted_from": name,
            "tombstone_segments": idx.describe()["tombstone_segments"],
        }))
    else:  # search
        if args.query_id is None:
            raise ValueError("vindex search requires --query-id")
        qvec = [
            float(x)
            for x in corpus()
            .where(F.col(args.id_col) == args.query_id)
            .select(args.vec_col)
            .collect()[0][0]
        ]
        idx = engine.vector_index(name)
        if idx.entry.get("ivf_assign_path"):
            out = idx.ivfpq_topk(qvec, n_probe=args.n_probe, k=args.k,
                                 predicate=args.where)
        else:
            out = idx.adc_topk(qvec, k=args.k, predicate=args.where)
        print(json.dumps({"results": [
            {args.id_col: r[args.id_col], "adist": r["adist"]}
            for r in out.collect()
        ]}))
    return 0


def _run_tindex(spark, engine, args) -> int:
    """`tindex` subcommand: the stored postings lifecycle from the
    shell. build/append tokenize a parquet corpus once; search serves
    BM25 purely from the stored postings — no --source touch at all."""
    name = args.name

    def corpus():
        if not args.source:
            raise ValueError(f"tindex {args.action} requires --source")
        return spark.read.parquet(args.source)

    if args.action == "build":
        from queens_spark.store.vector_index import source_fingerprint

        kw = {}
        if args.n_buckets:
            kw["n_buckets"] = args.n_buckets
        if args.meta_cols:
            kw["meta_cols"] = args.meta_cols.split(",")
        if args.positions:
            kw["positions"] = True
        if args.max_df_ratio is not None:
            kw["max_df_ratio"] = args.max_df_ratio
        idx = engine.build_text_index(
            corpus(), args.text_col, args.id_col, name,
            fingerprint=source_fingerprint(args.source), **kw,
        )
        print(json.dumps({"built": name, **idx.describe()}))
    elif args.action == "append":
        from queens_spark.store.vector_index import source_fingerprint

        idx = engine.append_text_index(
            corpus(), name, fingerprint=source_fingerprint(args.source)
        )
        print(json.dumps({"appended": name,
                          "segments": len(idx.entry["segments"])}))
    elif args.action == "compact":
        import os as _os

        from queens_spark.store.text_index import compact_text_index

        idx = compact_text_index(
            spark,
            _os.path.join(engine.warehouse.root, "system", "text_index"),
            name,
        )
        print(json.dumps({"compacted": name,
                          "version": idx.entry["version"]}))
    elif args.action == "describe":
        print(json.dumps(engine.text_index(name).describe()))
    elif args.action == "stats":
        idx = engine.text_index(name)
        hot = [
            {"token": r["token"], "df_docs": r["df_docs"],
             "occurrences": r["occurrences"],
             "tok_bucket": r["tok_bucket"]}
            for r in idx.token_stats(top=args.top).collect()
        ]
        sizes = sorted(
            r["n_postings"] for r in idx.bucket_stats().collect()
        )
        med = sizes[len(sizes) // 2] if sizes else 0
        print(json.dumps({
            "name": name,
            "hot_tokens": hot,
            "buckets": len(sizes),
            "max_bucket_postings": sizes[-1] if sizes else 0,
            "median_bucket_postings": med,
            "max_over_median": (
                round(sizes[-1] / med, 2) if med else None
            ),
        }))
    elif args.action == "delete":
        if (args.ids is None) == (args.where is None):
            raise ValueError(
                "tindex delete requires exactly one of --ids/--where"
            )
        idx = engine.delete_from_text_index(
            name,
            ids=(
                [int(x) for x in args.ids.split(",") if x]
                if args.ids else None
            ),
            predicate=args.where,
        )
        print(json.dumps({
            "deleted_from": name,
            "tombstone_segments":
                idx.describe()["tombstone_segments"],
        }))
    else:  # search
        if args.queries:
            idx = engine.text_index(name)
            out = idx.batch_bm25_topk(
                spark.read.parquet(args.queries),
                k=args.k, predicate=args.where,
            )
            print(json.dumps({"results": [
                {"query_id": r["query_id"], "doc": r["doc"],
                 "bm25_e5": r["bm25_e5"], "n_terms": r["n_terms"]}
                for r in out.collect()
            ]}))
            return 0
        if not args.terms:
            raise ValueError(
                "tindex search requires --terms or --queries"
            )
        terms = [t for t in args.terms.split(",") if t]
        idx = engine.text_index(name)
        if args.facet is not None:
            out = idx.facet_counts(
                terms, args.facet, predicate=args.where,
                require_all=args.require_all,
            )
            rows = [{"facet_value": r[args.facet], "n_docs": r["n_docs"]}
                    for r in out.collect()]
        elif args.phrase:
            out = idx.phrase_topk(terms, k=args.k, predicate=args.where)
            rows = [{"doc": r["doc"],
                     "n_occurrences": r["n_occurrences"]}
                    for r in out.collect()]
        elif args.snippet is not None:
            out = idx.snippet_topk(terms, k=args.k, window=args.snippet,
                                   predicate=args.where)
            rows = [{"doc": r["doc"],
                     "window_start": r["window_start"],
                     "n_hits": r["n_hits"]}
                    for r in out.collect()]
        elif args.near is not None:
            out = idx.proximity_topk(terms, window=args.near, k=args.k,
                                     predicate=args.where)
            rows = [{"doc": r["doc"], "n_windows": r["n_windows"]}
                    for r in out.collect()]
        elif args.fuzzy is not None:
            out = idx.corrected_bm25_topk(
                terms, k=args.k, max_dist=args.fuzzy,
                predicate=args.where, require_all=args.require_all,
            )
            rows = [{"doc": r["doc"], "bm25_e5": r["bm25_e5"],
                     "n_terms": r["n_terms"]}
                    for r in out.collect()]
        else:
            out = idx.bm25_topk(terms, k=args.k, predicate=args.where,
                                require_all=args.require_all)
            rows = [{"doc": r["doc"], "bm25_e5": r["bm25_e5"],
                     "n_terms": r["n_terms"]}
                    for r in out.collect()]
        print(json.dumps({"results": rows}))
    return 0


def _run_cmap(spark, engine, args) -> int:
    import json as _json

    if args.action == "build":
        if not args.source:
            print("build needs --source", file=sys.stderr)
            return 2
        max_df = args.max_df if args.max_df == "auto" else int(args.max_df)
        cm = engine.build_cluster_map(
            spark.read.parquet(args.source), args.text_col, args.id_col,
            args.name, n=args.n, threshold=args.threshold, max_df=max_df,
        )
        print(_json.dumps(cm.describe()))
    elif args.action == "append":
        if not args.source:
            print("append needs --source", file=sys.stderr)
            return 2
        cm = engine.append_cluster_map(
            spark.read.parquet(args.source), args.name, token=args.token
        )
        print(_json.dumps(cm.describe()))
    elif args.action == "retire":
        if not args.ids:
            print("retire needs --ids", file=sys.stderr)
            return 2
        cm = engine.retire_from_cluster_map(
            args.name, [int(x) for x in args.ids.split(",") if x]
        )
        print(_json.dumps(cm.describe()))
    elif args.action == "describe":
        print(_json.dumps(engine.cluster_map(args.name).describe()))
    else:
        cm = engine.cluster_map(args.name)
        frame = getattr(cm, args.action)()
        for r in frame.limit(args.limit).collect():
            print(_json.dumps(r.asDict()))
    return 0


def _run_ecdf(spark, engine, args) -> int:
    import json as _json

    if args.action == "build":
        if not args.source or not (args.value_sql or args.profiles):
            print("build needs --source and --value-sql (or --profiles)",
                  file=sys.stderr)
            return 2
        if args.profiles:
            st = engine.build_ecdf_profiles(
                spark.read.parquet(args.source), args.group_col,
                _json.loads(args.profiles), args.name,
            )
        else:
            st = engine.build_ecdf_store(
                spark.read.parquet(args.source), args.group_col,
                args.value_sql, args.name,
                width=args.width, n_buckets=args.n_buckets,
            )
        print(_json.dumps(st.describe()))
    elif args.action == "append":
        if not args.source:
            print("append needs --source", file=sys.stderr)
            return 2
        st = engine.append_ecdf_store(
            spark.read.parquet(args.source), args.name, token=args.token
        )
        print(_json.dumps(st.describe()))
    elif args.action == "describe":
        print(_json.dumps(engine.ecdf_store(args.name).describe()))
    elif args.action == "cdf":
        rows = engine.ecdf_store(args.name).cdf(
            profile=args.profile
        ).collect()
        for r in rows:
            print(_json.dumps(r.asDict()))
    elif args.action == "thresholds":
        # keyed by the raw basis points so values inside the same
        # 100-bp band (e.g. 2500,2550) never collapse to one threshold
        bps = {f"bp{int(b)}": int(b) for b in args.bp.split(",")}
        rows = engine.ecdf_store(args.name).thresholds(
            bps, profile=args.profile
        ).collect()
        for r in rows:
            print(_json.dumps(r.asDict()))
    elif args.action == "drift":
        from queens_spark.operators.drift import drift_from_count_frame

        st = engine.ecdf_store(args.name)
        rows = drift_from_count_frame(
            st.hist(profile=args.profile), st.group_col
        ).collect()
        for r in rows:
            print(_json.dumps(r.asDict()))
    return 0


def _run_skstore(spark, engine, args) -> int:
    import json as _json

    if args.action == "build":
        if not args.source or not args.key_col:
            print("build needs --source and --key-col", file=sys.stderr)
            return 2
        st = engine.build_sketch_store(
            spark.read.parquet(args.source), args.group_col,
            args.key_col, args.name, k=args.k,
        )
        print(_json.dumps(st.describe()))
    elif args.action == "append":
        if not args.source:
            print("append needs --source", file=sys.stderr)
            return 2
        st = engine.append_sketch_store(
            spark.read.parquet(args.source), args.name, token=args.token
        )
        print(_json.dumps(st.describe()))
    elif args.action == "describe":
        print(_json.dumps(engine.sketch_store(args.name).describe()))
    elif args.action == "distinct":
        rows = engine.sketch_store(args.name).distinct_estimates().collect()
        for r in rows:
            print(_json.dumps(r.asDict()))
    elif args.action == "overlap":
        rows = engine.sketch_store(args.name).pair_overlap().collect()
        for r in rows:
            print(_json.dumps(r.asDict()))
    return 0
