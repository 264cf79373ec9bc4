from .encode_stream import dedup_stream, encode_stream, windowed_event_counts  # noqa: F401
