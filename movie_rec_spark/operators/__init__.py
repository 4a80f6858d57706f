from movie_rec_spark.operators import (  # noqa: F401
    mutation,
    relational,
)
