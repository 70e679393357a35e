"""Structured Streaming variants of the event-time operators
(SURVEY.md §2.B streaming table: the reference itself has zero streaming
code; these are the extension-tier equivalents of operators/events.py)."""

from database_toolbox_spark.streaming.stream_ops import (  # noqa: F401
    TWS_REQUIREMENT,
    read_docs_stream,
    read_events_stream,
    read_near_dup_pairs,
    read_cdc_snapshot,
    read_foreach_batch_snapshot,
    stream_bot_flags,
    stream_bottomk_sample,
    stream_cdc_upsert,
    stream_count_min,
    stream_foreach_batch_totals,
    stream_dedup,
    stream_enriched_event_counts,
    stream_heavy_hitters,
    stream_hourly_counts,
    stream_minhash_near_dup,
    stream_ohlc_bars,
    stream_pattern_alerts,
    stream_session_windows,
    stream_user_running_totals,
    stream_user_totals_tws,
    stream_srm_monitor,
    stream_value_anomalies,
    stream_user_totals_with_timeout,
    stream_view_click_join,
    tws_available,
)
