from movie_rec_spark.operators import (  # noqa: F401
    dedup,
    multimodal,
    mutation,
    relational,
    similarity,
    text,
)
