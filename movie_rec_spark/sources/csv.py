"""CSV sources — reference ingestion parity (SURVEY.md §2.1 S1-S3).

The reference loads MovieLens CSVs with explicit dtype maps and column
selections (prepare_dataset.py:76-82,106-112,160-163). Spark equivalents:
explicit StructType (never inferSchema on ingest — §1.3), select-projection
(Catalyst prunes at the scan), and quote/escape/multiLine for QUOTE_ALL
fields with embedded commas/newlines (written by prepare_dataset.py:125).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RATINGS_CSV_SCHEMA = StructType([
    StructField("userId", IntegerType()),
    StructField("movieId", IntegerType()),
    StructField("rating", DoubleType()),
    StructField("timestamp", LongType()),
])

LINKS_CSV_SCHEMA = StructType([
    StructField("movieId", IntegerType()),
    StructField("imdbId", StringType()),
    StructField("tmdbId", IntegerType()),
])


def read_ratings_csv(spark: SparkSession, path: str) -> DataFrame:
    """S1: typed header CSV scan + rename + epoch→timestamp (F1)
    (prepare_dataset.py:76-84: names=[...], dtype={int32,float32},
    to_datetime(unit='s'))."""
    from pyspark.sql import functions as F

    return (
        spark.read.schema(RATINGS_CSV_SCHEMA)
        .option("header", True)
        .csv(path)
        .select(
            F.col("userId").alias("user_id"),
            F.col("movieId").alias("movie_id"),
            F.col("rating"),
            F.timestamp_seconds(F.col("timestamp")).alias("ts"),
        )
    )


def read_links_csv(spark: SparkSession, path: str) -> DataFrame:
    """S2: CSV scan keeping columns 0,2 only (usecols=[0,2],
    prepare_dataset.py:106-112). The .select IS the pruning — Catalyst
    pushes it into the scan."""
    from pyspark.sql import functions as F

    return (
        spark.read.schema(LINKS_CSV_SCHEMA)
        .option("header", True)
        .csv(path)
        .select(
            F.col("movieId").alias("movie_id"),
            F.col("tmdbId").alias("tmdb_id"),
        )
    )


def read_quoted_csv(spark: SparkSession, path: str,
                    schema: StructType) -> DataFrame:
    """S3: QUOTE_ALL CSV with embedded commas/newlines/quotes
    (movies_enriched.csv, written with csv.QUOTE_ALL at
    prepare_dataset.py:125). multiLine allows records spanning lines;
    escape='"' handles RFC-4180 doubled quotes."""
    return (
        spark.read.schema(schema)
        .option("header", True)
        .option("quote", '"')
        .option("escape", '"')
        .option("multiLine", True)
        .csv(path)
    )
