"""JSON-lines source/sink — the remaining interchange format.

The reference's only JSON surfaces are the TMDB API responses parsed in
its ingestion script (``prototype/prepare_dataset.py:136-142``) and the
marshmallow response serialization (``web/app/models.py:25-30``); the
engine-side equivalents are ``from_json`` over an explicit schema and
``to_json(struct(...))`` (S5/S12 in SURVEY.md §2.1). This module adds
the file-level counterpart: newline-delimited JSON corpora, the other
common wire format for document pipelines (web-crawl dumps arrive as
.jsonl far more often than parquet).

Discipline is the same as the CSV sources: ALWAYS an explicit schema —
``inferSchema``/sampling on a 100 TB corpus means a second full scan
and nondeterministic column types; a declared StructType makes the scan
single-pass and the corrupt-record behavior explicit (PERMISSIVE rows
with a _corrupt_record column, or DROPMALFORMED/FAILFAST by caller
choice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_jsonl(spark: SparkSession, path: str, schema: StructType,
               mode: str = "PERMISSIVE") -> DataFrame:
    """Typed newline-delimited JSON scan. Column pruning and filter
    pushdown work exactly as for parquet minus the columnar stats —
    the .select/.filter a caller chains still prune the parsed fields
    (Spark's JSON reader does schema-guided partial parsing)."""
    return (
        spark.read.schema(schema)
        .option("mode", mode)
        .json(path)
    )


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """JSON-lines sink: one JSON object per row, partitioned like any
    other file sink (S12's to_json is the per-row expression form; this
    is the dataset form)."""
    df.write.mode(mode).json(path)


def parse_json_column(df: DataFrame, col: str, schema: StructType,
                      out: str = "parsed") -> DataFrame:
    """S5's engine-side half: parse an embedded JSON string column with
    an explicit schema (reference: result.json() field extraction at
    prepare_dataset.py:136-142). JVM-side from_json — no Python."""
    return df.withColumn(out, F.from_json(F.col(col), schema))
