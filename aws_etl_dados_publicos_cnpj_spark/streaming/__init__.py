from .windows import hourly_event_rollup, streaming_hourly_rollup  # noqa: F401
