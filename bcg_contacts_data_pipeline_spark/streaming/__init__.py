from bcg_contacts_data_pipeline_spark.streaming.ops import (
    chained_window_agg,
    dedup_within_watermark,
    stream_static_enrich,
    stream_stream_time_join,
    running_user_stats,
    running_user_stats_tws,
    session_agg,
    session_close_stream,
    windowed_agg,
)
from bcg_contacts_data_pipeline_spark.streaming.runner import (
    idempotent_batch_writer,
    run_available_now,
    run_foreach_batch,
    run_to_files,
)
from bcg_contacts_data_pipeline_spark.streaming.sources import (
    events_stream,
    events_stream_duplicated,
    file_stream,
    stage_as_dir,
)

__all__ = [
    "chained_window_agg",
    "dedup_within_watermark",
    "events_stream",
    "events_stream_duplicated",
    "file_stream",
    "idempotent_batch_writer",
    "run_available_now",
    "run_foreach_batch",
    "run_to_files",
    "running_user_stats",
    "running_user_stats_tws",
    "session_agg",
    "session_close_stream",
    "stage_as_dir",
    "stream_static_enrich",
    "stream_stream_time_join",
    "windowed_agg",
]
