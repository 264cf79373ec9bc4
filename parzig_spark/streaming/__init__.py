from .encode_stream import encode_stream, windowed_event_counts  # noqa: F401
