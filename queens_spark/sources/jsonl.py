"""JSON-lines corpus ingestion — the interchange format LLM training
corpora actually arrive in (one JSON document per line, sharded,
usually gz-compressed; Spark's json source handles .gz transparently).

Design for 100 TB ingest: an EXPLICIT schema (schema inference scans
the whole input twice — never at scale), PERMISSIVE parse mode with a
corrupt-record column, and a hard good/quarantine split: at corpus
scale malformed lines are a certainty, and silently dropping them
(DROPMALFORMED) destroys the audit trail while FAILFAST turns one bad
byte into a dead pipeline. The reader returns both frames; land the
quarantine next to the corpus and alert on its row count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, types as T

#: the documents-table shape (TESTDATA.md) — override per corpus
DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])

_CORRUPT = "_corrupt_record"


def read_corpus_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus with an explicit schema; returns
    ``(good, quarantine)``. *good* has exactly *schema*'s columns;
    *quarantine* has ``raw_line`` (the offending input line) plus the
    schema columns — partially-parsed fields survive for debugging,
    and Spark requires at least one non-corrupt column referenced
    when querying a raw-scan corrupt record anyway
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN).

    The split predicate is pushed into the scan (one pass, two
    filtered reads of the same files — Spark caches nothing here, so
    at scale persist *good* if both sides are consumed). A line that
    parses but violates the schema's types also lands in quarantine
    (PERMISSIVE nulls the row and fills the corrupt column).
    """
    if any(f.name == _CORRUPT for f in schema.fields):
        raise ValueError(f"schema may not contain '{_CORRUPT}'")
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )
    good = df.where(df[_CORRUPT].isNull()).drop(_CORRUPT)
    quarantine = df.where(df[_CORRUPT].isNotNull()).withColumnRenamed(
        _CORRUPT, "raw_line"
    )
    return good, quarantine
