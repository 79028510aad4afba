from mapreducecf_spark.streaming.windows import (
    stream_events,
    streaming_session_per_user,
    streaming_sliding,
    streaming_tumbling_hourly,
)

__all__ = [
    "stream_events",
    "streaming_session_per_user",
    "streaming_sliding",
    "streaming_tumbling_hourly",
]
