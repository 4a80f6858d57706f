from movie_rec_spark.sources.catalog import Catalog, load_table  # noqa: F401
