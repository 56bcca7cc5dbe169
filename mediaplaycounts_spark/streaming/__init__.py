"""Structured Streaming jobs (SURVEY.md §2.G).

The reference's daily cron is a 24-hour-latency batch stream; these jobs
generalize it to micro-batch streaming with watermarks, session windows,
stateful dedup, and foreachBatch serving-sink upserts. The bounded
``events`` parquet doubles as a deterministic replay source via
``Trigger.AvailableNow``.
"""

from mediaplaycounts_spark.streaming.jobs import (  # noqa: F401
    read_events_stream,
    run_available_now,
)
