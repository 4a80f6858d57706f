"""Table catalog over the driver-generated parquet test data.

Reference analogue: the Postgres system-of-record tables
(reference ``prototype/movierama_ddl.sql:1-33``) become columnar parquet
"silver" tables read straight by Spark (SURVEY.md §1.4). Scans are
declarative — ``spark.read.parquet`` + ``.select``/``.filter`` — so
Catalyst pushes predicates and prunes columns down to the parquet reader
(visible as PushedFilters / ReadSchema in ``.explain``).
"""

from __future__ import annotations

import os
from functools import lru_cache

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


@lru_cache(maxsize=256)
def _nanos_ts_columns(path: str) -> tuple[str, ...]:
    """Columns stored as parquet TIMESTAMP(NANOS) — Spark can't map those
    natively, so they're read as int64 (nanosAsLong) and converted.

    ``path`` may be a single file (the driver fixtures) or a
    directory-shaped table (anything Spark wrote — the normal lakehouse
    layout); for a directory the schema comes from its first part file
    (parquet tables are schema-uniform by contract)."""
    if os.path.isdir(path):
        parts = sorted(
            f for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_")))
        if not parts:
            return ()
        path = os.path.join(path, parts[0])
    schema = pq.read_schema(path)
    return tuple(
        f.name for f in schema
        if str(f.type).startswith("timestamp[ns")
    )


@lru_cache(maxsize=256)
def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count of a catalog table from parquet FOOTER metadata —
    no Spark job, no scan, memoized per (sf_dir, table). The cheap
    answer for operators that need corpus size only to SIZE themselves
    (LSH auto-sizing, SemDeDup cell count): a ``df.count()`` on the
    query path costs a full (column-pruned) scan per invocation, which
    bench measured at +0.4 s on q_neardup_lsh. Parquet tables are
    immutable here, so the memo never goes stale."""
    path = f"{sf_dir}/{name}.parquet"
    if os.path.isdir(path):
        return sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith((".", "_")))
    return pq.ParquetFile(path).metadata.num_rows


def _ship_package(spark: SparkSession) -> None:
    """Make ``movie_rec_spark`` importable on executor Python workers.

    Cloudpickle serializes module-level functions BY REFERENCE, so any
    UDF closure that touches one makes the worker import this package.
    The driver controls its own sys.path; workers inherit only cwd —
    fine when the driver runs from the repo, broken anywhere else. Zip
    the package once per SparkContext and addPyFile it: workers unpack
    onto their sys.path and every by-reference pickle resolves,
    regardless of where the consuming driver was launched.
    """
    sc = spark.sparkContext
    if getattr(sc, "_movie_rec_spark_shipped", False):
        return
    import tempfile
    import zipfile

    import movie_rec_spark

    pkg_dir = os.path.dirname(os.path.abspath(movie_rec_spark.__file__))
    zpath = os.path.join(tempfile.mkdtemp(prefix="mrs_pkg_"),
                         "movie_rec_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    rel = os.path.join(
                        "movie_rec_spark", os.path.relpath(full, pkg_dir))
                    z.write(full, rel)
    sc.addPyFile(zpath)
    sc._movie_rec_spark_shipped = True


# Analyzed Spark schema per table PATH, filled on first read. Catalog
# tables are immutable driver fixtures (same contract as the
# table_rows footer memo above), so the schema never goes stale; a
# schema-supplied read skips the JVM's footer-inference pass, which
# profiling measured at ~80 ms per spark.read.parquet call — the
# single largest slice of the per-query driver-side floor (a query
# loading 4 tables paid ~320 ms before its first job).
_SCHEMA_CACHE: dict[str, object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. Column pruning / predicate pushdown happen at the
    caller's ``select``/``filter`` — never pre-collect or cache here.

    The driver-generated parquet stores timestamps at nanosecond
    precision; Spark's reader rejects TIMESTAMP(NANOS), so those columns
    are read as raw int64 (``spark.sql.legacy.parquet.nanosAsLong``) and
    floor-truncated to microseconds (``ts div 1000`` — integer division;
    a double division would lose precision at 1e18 ns). DuckDB performs
    the same floor-truncation when reading ns parquet, so values match.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ship_package(spark)
    path = f"{sf_dir}/{name}.parquet"
    ts_cols = _nanos_ts_columns(path)
    if ts_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    sch = _SCHEMA_CACHE.get(path)
    if sch is None:
        # first read infers (under the nanosAsLong conf set above) and
        # memoizes the ANALYZED schema; later reads supply it explicitly
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[path] = df.schema
    else:
        df = spark.read.schema(sch).parquet(path)
    for c in ts_cols:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


class Catalog:
    """Lazy table accessor bound to one scale-factor directory."""

    def __init__(self, spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR):
        self.spark = spark
        self.sf_dir = sf_dir

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return load_table(self.spark, self.sf_dir, name)
        raise AttributeError(name)

    def table(self, name: str) -> DataFrame:
        return load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql() use."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
