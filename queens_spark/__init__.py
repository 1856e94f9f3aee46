"""queens_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the QUEENS reference (alebgz-91/queens).

Built from scratch on the Spark DataFrame/SQL API: declarative plans,
Catalyst optimization, partitioned Parquet storage. The reference's
pandas/SQLite execution model is *not* ported — only its semantics
(data model, filter DSL, versioned ingest/staging, reshaping operators)
are re-expressed Spark-first, plus large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal).
"""

__version__ = "0.1.0"

from queens_spark.session import get_spark  # noqa: F401
