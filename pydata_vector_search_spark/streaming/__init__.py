from pydata_vector_search_spark.streaming.events import (  # noqa: F401
    dedup_stream,
    read_changes_stream,
    read_events_stream,
    session_window_agg,
    sliding_window_agg,
    stream_stream_join,
    stream_upsert_sink,
    tumbling_window_agg,
    running_totals_stateful,
)
