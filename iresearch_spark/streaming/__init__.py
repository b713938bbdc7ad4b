from iresearch_spark.streaming.incremental import (  # noqa: F401
    IncrementalIndexer,
    index_stream,
)
