from typical_spark.sources.tables import TABLE_NAMES, load_table, load_tables
from typical_spark.sources.transcripts import (
    generate_conversations_pdf,
    generate_transcripts_pdf,
    transcripts_dataset,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "generate_transcripts_pdf",
    "generate_conversations_pdf",
    "transcripts_dataset",
]
