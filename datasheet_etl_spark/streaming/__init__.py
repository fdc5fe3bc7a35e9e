"""Structured Streaming surface.

The batch inventory's streaming-shaped queries (Q31 windows, Q32 dedup,
Q18 sessionize) re-expressed over ``readStream`` sources, plus the
incremental-file pipeline that replaces the reference's
skip-if-output-exists rerun loop (batch_export.py:128-132) with a
checkpointed file source — exactly-once per input file.

Batch mode remains the correctness oracle: every operator here takes a
plain events DataFrame (streaming or batch), and the streaming smoke
tests assert the availableNow result equals the batch result.
"""

from datasheet_etl_spark.streaming.streams import (
    events_stream,
    incremental_file_pipeline,
    run_available_now,
    session_counts,
    sessionize_stateful,
    sliding_counts,
    streaming_dedup,
    streaming_dedup_within_watermark,
    tumbling_counts,
)

__all__ = [
    "events_stream",
    "incremental_file_pipeline",
    "run_available_now",
    "session_counts",
    "sessionize_stateful",
    "sliding_counts",
    "streaming_dedup",
    "streaming_dedup_within_watermark",
    "tumbling_counts",
]
