from .encode_stream import encode_stream, stream_from_directory

__all__ = ["encode_stream", "stream_from_directory"]
