from aroma_spark.sources.transcripts import (  # noqa: F401
    load_table,
    load_transcripts,
    transcripts_from_events,
)
