from typical_spark.streaming.validate_stream import (
    streaming_validation,
    streaming_verdicts,
    windowed_check_stats,
)

__all__ = ["streaming_validation", "streaming_verdicts", "windowed_check_stats"]
