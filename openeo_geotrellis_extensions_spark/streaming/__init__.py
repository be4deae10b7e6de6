from .events import windowed_event_stats, run_stream_to_memory

__all__ = ["windowed_event_stats", "run_stream_to_memory"]
