from typical_spark.streaming.incremental import minhash_stream_dedup
from typical_spark.streaming.validate_stream import (
    streaming_validation,
    streaming_verdicts,
    windowed_check_stats,
)

__all__ = [
    "minhash_stream_dedup",
    "streaming_validation",
    "streaming_verdicts",
    "windowed_check_stats",
]
