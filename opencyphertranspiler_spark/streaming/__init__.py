from .windows import sessionize, stream_windowed_counts, windowed_event_stats

__all__ = ["sessionize", "stream_windowed_counts", "windowed_event_stats"]
