from iresearch_spark.index.build import build_index, SEGMENTS_SCHEMA  # noqa: F401
from iresearch_spark.index.manifest import (  # noqa: F401
    Manifest,
    prune_generations,
    read_manifest,
    write_manifest,
)
from iresearch_spark.index.deletes import (  # noqa: F401
    deletion_ratio,
    mark_deleted,
    mark_deleted_rows,
    plan_cleanup,
)
from iresearch_spark.index.importer import import_index  # noqa: F401
from iresearch_spark.index.merge import (  # noqa: F401
    consolidate,
    merge_segments,
    plan_bytes,
    plan_bytes_accum,
    plan_count,
    plan_docs_fill,
    plan_docs_live,
    plan_tier,
)
