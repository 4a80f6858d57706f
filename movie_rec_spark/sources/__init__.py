from movie_rec_spark.sources.catalog import Catalog, load_table  # noqa: F401
from movie_rec_spark.sources.jdbc import read_jdbc, write_jdbc  # noqa: F401
