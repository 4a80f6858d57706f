from movie_rec_spark.streaming.counters import (  # noqa: F401
    event_counters,
    event_counters_cdc,
    incremental_stats,
    read_cdc_stream,
    read_event_stream,
    run_counters_batchwise,
    run_with_foreach_batch,
    windowed_counters,
)
from movie_rec_spark.streaming.joins import (  # noqa: F401
    attribution_join,
    split_typed_streams,
)
from movie_rec_spark.streaming.sessions import (  # noqa: F401
    session_windows_stream,
    stateful_sessions,
)
from movie_rec_spark.streaming.anomaly import (  # noqa: F401
    anomaly_stream,
    anomaly_stream_eventtime,
)
from movie_rec_spark.streaming.sketch import (  # noqa: F401
    heavy_hitters_stream,
)
