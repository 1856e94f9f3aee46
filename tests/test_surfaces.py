"""Tests for the orchestration + user surfaces: config-driven ingest,
exports, query service (HTTP contract), CLI parser, scraper parsing.
"""

import json
from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import Row

from queens_spark.api import QueryService
from queens_spark.etl.process import (
    ingest_table,
    resolve_table_config,
    stage_data,
    table_to_chapter,
)
from queens_spark.facade import Engine
from queens_spark.sources.export import export_all, export_table
from queens_spark.sources.scrape import parse_dukes_links


def raw_sheet():
    return pd.DataFrame([
        ["DUKES 1.1 title", None, None],
        ["rowhdr", "2019", "2020"],
        ["Production", 1.0, 4.0],
        ["Imports", 2.5, 5.5],
    ])


ETL_CONFIG = {
    "dukes": {
        "chapter_1": {
            "1.1": {
                "f": "process_sheet",
                "f_args": {"sheet_name": "1.1", "ignore_mapping": True,
                           "id_var_name": "fuel", "unit": "ktoe",
                           "var_to_melt": "year"},
                "description": "Aggregate energy balance",
            }
        }
    }
}


@pytest.fixture()
def engine(spark, warehouse_root):
    return Engine(spark, warehouse_root)


@pytest.fixture()
def staged_engine(spark, engine):
    ingest_table(
        engine, "dukes", "1.1",
        raw_sheets={"1.1": raw_sheet()},
        etl_config=ETL_CONFIG,
        ingest_ts=datetime(2024, 1, 1),
    )
    stage_data(engine, "dukes")
    return engine


def test_table_to_chapter():
    assert table_to_chapter("1.2.3") == "chapter_1"
    assert table_to_chapter("5.6") == "chapter_5"
    assert table_to_chapter("J.1") == "chapter_5"
    assert table_to_chapter("F.2") == "chapter_6"
    with pytest.raises(KeyError):
        table_to_chapter("Z.9")


def test_resolve_table_config_errors():
    with pytest.raises(KeyError):
        resolve_table_config(ETL_CONFIG, "nope", "1.1")
    with pytest.raises(KeyError):
        resolve_table_config(ETL_CONFIG, "dukes", "1.99")


def test_ingest_all_tables(spark, engine):
    from queens_spark.etl.process import configured_tables, ingest_all_tables

    assert configured_tables(ETL_CONFIG, "dukes") == ["1.1"]
    out = ingest_all_tables(
        engine, "dukes",
        workbooks={"1.1": {"1.1": raw_sheet()}},
        etl_config=ETL_CONFIG,
        ingest_ts=datetime(2024, 1, 1),
    )
    assert "1.1" in out and out["1.1"]["1.1"] == 1


def test_config_driven_ingest_to_query(staged_engine):
    out = staged_engine.query("dukes", "1.1", {"year": 2020}).collect()
    assert len(out) == 2
    vals = {r["label"]: r["value"] for r in out}
    assert vals == {"Production": 4.0, "Imports": 5.5}
    assert {r["unit"] for r in out} == {"ktoe"}


# ------------------------------------------------------------ service

def test_service_happy_path(staged_engine):
    svc = QueryService(staged_engine)
    resp = svc.get_data("dukes", "1.1", filters='{"fuel": "production"}')
    assert resp.status == 200
    assert resp.body["n_rows"] == 2  # NOCASE matched 'Production'
    assert resp.body["next_cursor"] is None


def test_service_pagination_cursor(staged_engine):
    svc = QueryService(staged_engine)
    resp = svc.get_data("dukes", "1.1", limit=3)
    assert resp.status == 200 and resp.body["n_rows"] == 3
    assert resp.body["next_cursor"] is not None
    resp2 = svc.get_data("dukes", "1.1", limit=3, cursor=resp.body["next_cursor"])
    assert resp2.body["n_rows"] == 1
    assert resp2.body["next_cursor"] is None


def test_service_returns_table_description(staged_engine):
    # The reference API ships table_description with every data page
    # (queens/api/app.py:170-185).
    svc = QueryService(staged_engine)
    resp = svc.get_data("dukes", "1.1", limit=2)
    assert resp.status == 200
    assert resp.body["table_description"] == "Aggregate energy balance"


def test_page_fetch_runs_one_spark_job_when_warm(spark, staged_engine):
    # Metadata probe + table description are memoized per snapshot
    # (store/warehouse.py caches keyed on the store dir mtime), so at
    # interactive QPS a warm page fetch costs exactly ONE Spark job —
    # the page collect itself.
    svc = QueryService(staged_engine)
    assert svc.get_data("dukes", "1.1", limit=2).status == 200  # warm-up
    sc = spark.sparkContext
    sc.setJobGroup("one-job-page", "warm page fetch")
    try:
        resp = svc.get_data("dukes", "1.1", limit=2)
    finally:
        sc.setJobGroup(None, None)
    assert resp.status == 200 and resp.body["n_rows"] == 2
    jobs = sc.statusTracker().getJobIdsForGroup("one-job-page")
    assert len(jobs) == 1, f"expected 1 Spark job for a warm page, got {jobs}"


def test_stage_invalidates_metadata_memo(spark, staged_engine):
    # Re-ingesting with a new description and re-staging must bust the
    # per-snapshot caches — a stale description would desync page body
    # and header.
    assert staged_engine.table_description("dukes", "1.1") == "Aggregate energy balance"
    cfg = json.loads(json.dumps(ETL_CONFIG))
    cfg["dukes"]["chapter_1"]["1.1"]["description"] = "Revised balance"
    ingest_table(
        staged_engine, "dukes", "1.1",
        raw_sheets={"1.1": raw_sheet()},
        etl_config=cfg,
        ingest_ts=datetime(2024, 2, 1),
    )
    stage_data(staged_engine, "dukes")
    assert staged_engine.table_description("dukes", "1.1") == "Revised balance"


def test_service_limit_zero_is_empty_page(staged_engine):
    svc = QueryService(staged_engine)
    resp = svc.get_data("dukes", "1.1", limit=0)
    assert resp.status == 200
    assert resp.body["n_rows"] == 0
    assert resp.body["next_cursor"] is None
    assert resp.body["data"] == []


def test_service_error_statuses(staged_engine):
    svc = QueryService(staged_engine)
    assert svc.get_data("nope", "1.1").status == 404
    assert svc.get_data("dukes", "9.9").status == 404
    assert svc.get_data("dukes", "1.1", filters="{not json").status == 400
    assert svc.get_data("dukes", "1.1", filters='{"bogus": 1}').status == 422
    assert svc.get_data("dukes", "1.1", filters='{"year": {"zz": 1}}').status == 422
    assert svc.get_data("dukes", "1.1", filters='{"fuel": {"like": 5}}').status == 422
    assert svc.get_metadata("dukes", "9.9").status == 404
    assert svc.get_versions("dukes").status == 200


# ------------------------------------------- four-config flow (parity)

def test_generate_config_reference_shape_end_to_end(spark, engine):
    """Drive ingest purely from the reference's four-config shape
    (etl_config + templates + urls + scraped chapter page), including
    scraped-description injection (queens/etl/validation.py:11-64)."""
    from queens_spark.etl.process import generate_config, ingest_table, stage_data

    templates_cfg = {"dukes": {"chapter_1": "dukes_ch_1.parquet"}}
    urls_cfg = {"dukes": {"chapter_1": "https://stats.example/dukes-ch1"}}
    html = (
        '<a href="/media/dukes_1.1.xlsx">'
        "DUKES 1.1: Aggregate energy balance (scraped)</a>"
    )
    fetched = []

    def fetch(u):
        fetched.append(u)
        return html

    cfg = generate_config(
        "dukes", "1.1",
        etl_config=ETL_CONFIG, templates=templates_cfg, urls=urls_cfg,
        fetch=fetch,
    )
    assert fetched == ["https://stats.example/dukes-ch1"]
    assert cfg["f_args"]["url"].endswith("dukes_1.1.xlsx")
    assert cfg["f_args"]["data_collection"] == "dukes"
    assert cfg["f_args"]["template_path"].endswith("templates/dukes_ch_1.parquet")
    assert "scraped" in cfg["table_description"]

    ingest_table(
        engine, "dukes", "1.1",
        raw_sheets={"1.1": raw_sheet()},
        config=cfg,
        ingest_ts=datetime(2024, 1, 1),
    )
    stage_data(engine, "dukes")
    svc = QueryService(engine)
    resp = svc.get_data("dukes", "1.1", limit=2)
    assert resp.body["table_description"].startswith("DUKES 1.1")
    log = engine.get_versions("dukes").collect()
    assert log[0]["url"].endswith("dukes_1.1.xlsx")


def test_generate_config_missing_table_in_links(spark):
    from queens_spark.etl.process import generate_config

    with pytest.raises(KeyError, match="cannot find table URL"):
        generate_config(
            "dukes", "1.1",
            etl_config=ETL_CONFIG,
            urls={"dukes": {"chapter_1": "https://x.test"}},
            scraped_links={"9.9": {"url": "u", "description": "d"}},
        )


def test_generate_config_template_frame_injection(spark):
    from queens_spark.etl.process import generate_config

    marker = object()
    cfg = generate_config(
        "dukes", "1.1",
        etl_config=ETL_CONFIG,
        templates={"dukes": {"chapter_1": "dukes_ch_1.parquet"}},
        template_frames={"dukes_ch_1.parquet": marker},
    )
    assert cfg["f_args"]["template"] is marker
    assert cfg["table_description"] == "Aggregate energy balance"


def test_settings_config_bootstrap(tmp_path):
    from queens_spark.settings import CONFIG_FILES, ensure_user_configs, load_configs

    dest = str(tmp_path / "cfg")
    out = ensure_user_configs(dest)
    assert out == dest
    import os
    for name in CONFIG_FILES:
        assert os.path.exists(os.path.join(dest, name))
    # user edits win: overwrite one file, re-bootstrap must not clobber
    with open(os.path.join(dest, "urls.json"), "w") as fh:
        fh.write('{"dukes": {"chapter_1": "https://mine.example"}}')
    ensure_user_configs(dest)
    cfgs = load_configs(dest)
    assert cfgs["urls"]["dukes"]["chapter_1"] == "https://mine.example"
    assert "dukes" in cfgs["etl_config"] and "dukes" in cfgs["templates"]


def test_explicit_initialize_is_idempotent(spark, engine):
    from queens_spark.etl.process import initialize

    assert initialize(engine, ["dukes"]) is True
    assert initialize(engine, ["dukes"]) is False  # second call: no-op
    # catalog probes work pre-ingest
    assert engine.warehouse.read_log("dukes").count() == 0
    assert engine.warehouse.queryable_columns("dukes", "1.1") == set()


# ------------------------------------------------------------- export

def test_export_csv_and_bulk_parquet(tmp_path, staged_engine, spark):
    out = export_table(staged_engine, "dukes", "csv", "1.1", str(tmp_path))
    back = spark.read.option("header", True).csv(out)
    assert back.count() == 4

    outs = export_all(staged_engine, "dukes", "parquet", str(tmp_path),
                      bulk_export=True)
    back = spark.read.parquet(outs[0])
    assert back.count() == 4
    assert "table_name" in back.columns


def test_export_jsonl(tmp_path, staged_engine, spark):
    out = export_table(staged_engine, "dukes", "jsonl", "1.1", str(tmp_path))
    back = spark.read.json(out)
    assert back.count() == 4
    assert "value" in back.columns


def test_export_xlsx_roundtrip(tmp_path, staged_engine):
    # xlsx export works without openpyxl (stdlib SpreadsheetML writer);
    # read back with the matching stdlib parser.
    from queens_spark.sources.xlsx_lite import read_workbook_xlsx

    out = export_table(staged_engine, "dukes", "xlsx", "1.1", str(tmp_path))
    sheets = read_workbook_xlsx(out)
    assert list(sheets) == ["1.1"]
    raw = sheets["1.1"]
    header = list(raw.iloc[0])
    assert "label" in header and "value" in header
    assert len(raw) == 5  # header + 4 data rows


def test_export_xlsx_bulk_sheet_per_table(tmp_path, staged_engine):
    from queens_spark.sources.xlsx_lite import read_workbook_xlsx

    outs = export_all(staged_engine, "dukes", "xlsx", str(tmp_path),
                      bulk_export=True)
    sheets = read_workbook_xlsx(outs[0])
    assert "1.1" in sheets


def test_xlsx_lite_typed_roundtrip(tmp_path):
    from queens_spark.sources.xlsx_lite import (
        read_workbook_xlsx,
        write_workbook_xlsx,
    )

    df = pd.DataFrame(
        {"a": [1, 2], "b": [1.5, None], "c": ["x & <y>", "ü"], "d": [True, False]}
    )
    path = str(tmp_path / "t.xlsx")
    write_workbook_xlsx(path, {"s1": df})
    back = read_workbook_xlsx(path)["s1"]
    assert list(back.iloc[0]) == ["a", "b", "c", "d"]
    assert back.iloc[1].tolist() == [1, 1.5, "x & <y>", True]
    assert back.iloc[2][0] == 2 and back.iloc[2][1] is None
    assert back.iloc[2][2] == "ü" and back.iloc[2][3] is False


def test_ingest_from_xlsx_file(tmp_path, spark, engine):
    # full file path: write a raw (header-less) workbook, ingest it
    # through the config-driven ETL, query the staged result.
    from queens_spark.sources.xlsx_lite import write_workbook_xlsx

    path = str(tmp_path / "dukes_1.1.xlsx")
    write_workbook_xlsx(path, {"1.1": raw_sheet()}, header=False)
    ingest_table(
        engine, "dukes", "1.1",
        workbook_path=path,
        etl_config=ETL_CONFIG,
        ingest_ts=datetime(2024, 1, 1),
    )
    stage_data(engine, "dukes")
    out = engine.query("dukes", "1.1", {"year": 2020}).collect()
    assert {r["label"]: r["value"] for r in out} == {
        "Production": 4.0, "Imports": 5.5,
    }


# -------------------------------------------------------------- CLI

def test_cli_parser_roundtrip():
    from queens_spark.cli import build_parser

    args = build_parser().parse_args(
        ["query", "dukes", "1.1", "--filters", '{"year": 2020}', "--limit", "10"]
    )
    assert args.command == "query" and args.table_name == "1.1"
    args = build_parser().parse_args(["stage", "dukes", "--as-of", "2024-01-01"])
    assert args.as_of == "2024-01-01"
    args = build_parser().parse_args(["export", "dukes", "csv", "/tmp/x", "--bulk"])
    assert args.bulk is True
    args = build_parser().parse_args(
        ["ingest", "dukes", "1.1", "--workbook", "/tmp/w.xlsx",
         "--etl-config", "/tmp/etl.json", "--template", "/tmp/t.parquet"]
    )
    assert args.command == "ingest" and args.workbook == "/tmp/w.xlsx"
    args = build_parser().parse_args(["serve", "--port", "9000"])
    assert args.port == 9000
    args = build_parser().parse_args(["config", "--show-current"])
    assert args.command == "config" and args.show_current is True


def test_cli_config_show_and_set(tmp_path, monkeypatch, capsys):
    # Reference parity (queens/cli.py:41-66): `config --show-current`
    # prints the resolved paths; `--warehouse-path/--export-path`
    # persist to config.ini; no flags → "nothing to change".
    import queens_spark.settings as s
    from queens_spark.cli import main

    monkeypatch.setattr(s, "USER_CONFIG_DIR", str(tmp_path / "cfg"))
    monkeypatch.delenv("QUEENS_SPARK_WAREHOUSE", raising=False)

    assert main(["config"]) == 0
    assert "Nothing to change" in capsys.readouterr().out

    assert main(["config", "--warehouse-path", str(tmp_path / "wh"),
                 "--export-path", str(tmp_path / "exp")]) == 0
    assert "Configuration updated" in capsys.readouterr().out

    assert main(["config", "--show-current"]) == 0
    shown = capsys.readouterr().out
    assert str(tmp_path / "wh") in shown and str(tmp_path / "exp") in shown
    # bootstrap happened: packaged defaults copied next to config.ini
    assert (tmp_path / "cfg" / "etl_config.json").exists()

    # resolution precedence: CLI arg > env > ini
    assert s.resolve_warehouse("/explicit") == "/explicit"
    monkeypatch.setenv("QUEENS_SPARK_WAREHOUSE", "/envwh")
    assert s.resolve_warehouse() == "/envwh"
    monkeypatch.delenv("QUEENS_SPARK_WAREHOUSE")
    assert s.resolve_warehouse() == str(tmp_path / "wh")


def test_cli_serve_without_fastapi_is_gated(capsys):
    # fastapi/uvicorn are absent in this runtime: `serve` must exit 2
    # with the remediation message BEFORE starting a Spark session,
    # not traceback on an ImportError.
    from queens_spark.cli import main

    try:
        import fastapi  # noqa: F401
        pytest.skip("fastapi installed; gated path not reachable")
    except ImportError:
        pass
    assert main(["serve"]) == 2
    assert "requires fastapi" in capsys.readouterr().err


# ------------------------------------------------------------ scraper

def test_parse_dukes_links():
    html = """
    <html><body>
      <a href="/media/dukes_1.1.xlsx">DUKES 1.1: Aggregate energy balance</a>
      <a href="/media/dukes_4.4a.xlsx">DUKES 4.4a renewables</a>
      <a href="/media/dukes_J.1.xlsx">DUKES J.1 gas flows</a>
      <a href="/media/notes.pdf">notes</a>
      <a href="/media/plain.xlsx">no table id here</a>
    </body></html>
    """
    out = parse_dukes_links(html)
    assert out["1.1"]["url"].endswith("dukes_1.1.xlsx")
    assert "4.4.A" in out
    assert "J.1" in out
    assert all(not k.endswith(".pdf") for k in out)


def test_export_orc_roundtrip_and_bulk(tmp_path, staged_engine, spark):
    out = export_table(staged_engine, "dukes", "orc", "1.1", str(tmp_path))
    back = spark.read.orc(out)
    assert back.count() == 4

    outs = export_all(staged_engine, "dukes", "orc", str(tmp_path / "bulk"),
                      bulk_export=True)
    back = spark.read.orc(outs[0])
    assert back.count() == 4 and "table_name" in back.columns


def test_read_corpus_jsonl_quarantines_bad_lines(tmp_path, spark):
    import json as _json

    from queens_spark.sources.jsonl import read_corpus_jsonl

    p = tmp_path / "corpus.jsonl"
    lines = [
        _json.dumps({"doc_id": 1, "text": "alpha", "lang": "en",
                     "source": "web", "n_chars": 5}),
        "{not json at all",
        _json.dumps({"doc_id": "NaNopé", "text": "bad id type",
                     "lang": "en", "source": "web", "n_chars": 11}),
        _json.dumps({"doc_id": 2, "text": "beta", "lang": "fr",
                     "source": "web", "n_chars": 4}),
    ]
    p.write_text("\n".join(lines) + "\n")
    good, quarantine = read_corpus_jsonl(spark, str(p))
    g = {r["doc_id"]: r["text"] for r in good.collect()}
    assert g == {1: "alpha", 2: "beta"}
    bad = [r["raw_line"] for r in quarantine.collect()]
    assert len(bad) == 2 and any("not json" in b for b in bad)
    assert "_corrupt_record" not in good.columns


def test_read_corpus_jsonl_schema_guard(spark):
    import pytest
    from pyspark.sql import types as T

    from queens_spark.sources.jsonl import read_corpus_jsonl

    bad_schema = T.StructType([T.StructField("_corrupt_record", T.StringType())])
    with pytest.raises(ValueError, match="_corrupt_record"):
        read_corpus_jsonl(spark, "/nonexistent", bad_schema)


def test_cli_vindex_lifecycle(tmp_path, capsys):
    """`vindex` from the shell: build (with IVF cells + meta), search
    (served from the stored artifacts), append, compact."""
    import json as _json

    from queens_spark.cli import main

    wh = str(tmp_path / "wh")
    src = "/root/testdata/sf0.001/embeddings.parquet"
    assert main(["--warehouse", wh, "vindex", "build", "emb",
                 "--source", src, "--cells-every", "200",
                 "--meta-cols", "label"]) == 0
    built = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert built["built"] == "emb" and built["ivf_cells"] >= 2

    assert main(["--warehouse", wh, "vindex", "search", "emb",
                 "--source", src, "--query-id", "7", "--k", "5"]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["results"]) == 5
    assert res["results"][0]["vec_id"] == 7  # self is nearest (adist 0)

    assert main(["--warehouse", wh, "vindex", "search", "emb",
                 "--source", src, "--query-id", "7", "--k", "3",
                 "--where", "label = 3"]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(res["results"]) == 3

    assert main(["--warehouse", wh, "vindex", "append", "emb",
                 "--source", src]) == 0
    appended = _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert appended["segments"] == 2

    assert main(["--warehouse", wh, "vindex", "compact", "emb"]) == 0
    compacted = _json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert compacted["compacted"] == "emb"


def test_corpus_report_verb_and_cli(spark, tmp_path, capsys):
    import json as _json

    from queens_spark.cli import main
    from queens_spark.facade import Engine

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eng = Engine(spark, str(tmp_path / "wh"))
    rep = eng.corpus_report(docs, "text", "doc_id", source_col="source")
    assert set(rep) == {"funnel", "duplication", "vocabulary",
                        "composition"}
    dup = rep["duplication"].collect()[0]
    assert dup["n_docs"] == docs.count()
    assert dup["n_distinct"] + dup["n_duplicates"] == dup["n_docs"]
    assert 0 <= dup["dup_share_bp"] <= 10000
    funnel = rep["funnel"].collect()
    assert sum(r["n_docs"] for r in funnel) == dup["n_docs"]
    comp = rep["composition"].collect()
    assert sum(r["n_docs"] for r in comp) == dup["n_docs"]
    vocab = rep["vocabulary"].collect()
    assert 0 < len(vocab) <= 50  # vocab_top default, tiny-sf vocab may be smaller

    rc = main(["--warehouse", str(tmp_path / "wh"), "report",
               "/root/testdata/sf0.001/documents.parquet",
               "--source-col", "source", "--vocab-top", "5"])
    assert rc == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(out) == {"funnel", "duplication", "vocabulary",
                        "composition"}
    assert len(out["vocabulary"]) == 5
    assert out["duplication"][0]["n_docs"] == docs.count()
