from mapreducecf_spark.streaming.stateful import running_user_totals
from mapreducecf_spark.streaming.windows import (
    stream_events,
    streaming_dedup,
    streaming_session_per_user,
    streaming_sliding,
    streaming_tumbling_hourly,
    write_stream_to_lake,
)

__all__ = [
    "running_user_totals",
    "stream_events",
    "streaming_dedup",
    "streaming_session_per_user",
    "streaming_sliding",
    "streaming_tumbling_hourly",
    "write_stream_to_lake",
]
