from typical_spark.functions.coerce import (
    bool_like,
    epoch_timestamp,
    iso_timestamp_strict,
    json_object,
    uuid_normalize,
)

__all__ = [
    "bool_like",
    "epoch_timestamp",
    "iso_timestamp_strict",
    "json_object",
    "uuid_normalize",
]
