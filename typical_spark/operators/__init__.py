from typical_spark.operators.uniqueness import dedup_keep_first, duplicate_rows, duplicate_key_counts
from typical_spark.operators.referential import referential_violations
from typical_spark.operators.ordering import ordering_violations
from typical_spark.operators.stats import column_stats

__all__ = [
    "dedup_keep_first",
    "duplicate_rows",
    "duplicate_key_counts",
    "referential_violations",
    "ordering_violations",
    "column_stats",
]
