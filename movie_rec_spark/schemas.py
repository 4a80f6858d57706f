"""Reference-domain schemas (SURVEY.md §1.2 / FIXTURES.md §A).

Fixed, declared schemas — never ``inferSchema`` on ingest (§1.3). Types
follow the Spark mapping table (SURVEY.md §1.4): int keys (LongType for
the 100 TB variant), DoubleType ratings, BooleanType is_implicit,
TimestampType UTC.
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# recommendation_users (movierama_ddl.sql:1-6, models.py:33-40)
USERS = StructType([
    StructField("user_id", IntegerType(), False),
    StructField("gender", StringType(), True),
    StructField("year_of_birth", IntegerType(), True),
])

# recommendation_movies (movierama_ddl.sql:25-32, models.py:56-63)
MOVIES = StructType([
    StructField("movie_id", IntegerType(), False),
    StructField("title", StringType(), False),
    StructField("year", IntegerType(), True),
    StructField("genres", StringType(), True),       # pipe-delimited (parity)
    StructField("description", StringType(), True),
])

# recommendation_ratings (movierama_ddl.sql:11-20, models.py:6-15);
# composite PK (user_id, movie_id) enforced by upsert_latest, not storage.
RATINGS = StructType([
    StructField("user_id", IntegerType(), False),
    StructField("movie_id", IntegerType(), False),
    StructField("rating", DoubleType(), True),
    StructField("is_implicit", BooleanType(), False),
    StructField("ts", TimestampType(), True),
])

# rating_events — append-only mutation log (FIXTURES.md §A)
RATING_EVENTS = StructType([
    StructField("op", StringType(), False),          # rate | watch | unrate
    StructField("user_id", IntegerType(), False),
    StructField("movie_id", IntegerType(), False),
    StructField("rating", DoubleType(), True),
    StructField("ts", TimestampType(), False),
])

# gold outputs
MOVIE_STATS = StructType([
    StructField("movie_id", IntegerType(), False),
    StructField("count_users", IntegerType(), False),
    StructField("avg_ratings", DoubleType(), False),
])
