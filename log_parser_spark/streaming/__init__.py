from .stream_pipeline import (  # noqa: F401
    alert_stream,
    hourly_windowed_counts,
    parse_stream,
    read_token_stream,
    sessionization_stream,
    start_sink_stream,
)
