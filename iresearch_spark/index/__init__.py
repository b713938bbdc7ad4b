from iresearch_spark.index.build import build_index, SEGMENTS_SCHEMA  # noqa: F401
from iresearch_spark.index.manifest import (  # noqa: F401
    Manifest,
    read_manifest,
    write_manifest,
)
