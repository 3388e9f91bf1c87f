from aroma_spark.streaming.stream import (  # noqa: F401
    streaming_rollup_1m,
    streaming_signals,
)
