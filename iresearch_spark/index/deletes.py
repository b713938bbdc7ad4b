"""Document deletion masks (the reference's update/delete model).

IResearch never modifies segment data: deletes write a per-segment document
mask, readers skip masked docs, and consolidation purges them with a dense
doc-id remap (`core/index/segment_writer.hpp:63-66`,
`core/utils/index_utils.hpp:384-385`, `merge_writer.cpp:1448-`). Spark
reading: a ``deletes`` parquet table of (segment_id, doc_id) tombstones,
appended per delete batch; the query kernel drops tombstoned docs at
posting-decode time; ``merge_segments(purge_deletes=True)`` rewrites merged
segments without them.

Stats semantics mirror the reference: index-wide term/field statistics keep
counting masked docs until a consolidation purges them (the reference's
scorers also see stale stats between commits and cleanup; ranks over live
docs are unaffected because all docs share the same global constants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from iresearch_spark.index.build import DOCMETA_SCHEMA
from iresearch_spark.index.manifest import read_manifest, write_manifest

DELETES_SCHEMA = "segment_id int, doc_id int"


def deletes_df(spark: SparkSession, index_dir: str) -> DataFrame:
    return (
        spark.read.schema(DELETES_SCHEMA)
        .parquet(f"{index_dir}/deletes")
        .dropDuplicates(["segment_id", "doc_id"])
    )


def mark_deleted(spark: SparkSession, index_dir: str, keys: DataFrame) -> int:
    """Tombstone the docs identified by (repo, path, commit) rows.

    Resolves identity through docmeta, appends to the deletes table, and
    publishes a manifest generation with per-segment deleted counts.
    Returns the number of NEW tombstones."""
    dm = spark.read.schema(DOCMETA_SCHEMA).parquet(f"{index_dir}/docmeta")
    resolved = dm.join(
        keys.select("repo", "path", "commit"), ["repo", "path", "commit"]
    ).select("segment_id", "doc_id")
    return mark_deleted_rows(spark, index_dir, resolved)


def mark_deleted_rows(
    spark: SparkSession, index_dir: str, resolved: DataFrame
) -> int:
    """Tombstone pre-resolved (segment_id, doc_id) rows — the segment-aware
    path (e.g. replace_batch deleting only PRE-batch segments' copies)."""
    import os

    resolved = resolved.select("segment_id", "doc_id").dropDuplicates(
        ["segment_id", "doc_id"]
    )
    if os.path.isdir(f"{index_dir}/deletes"):
        resolved = resolved.exceptAll(deletes_df(spark, index_dir))
    resolved = resolved.cache()
    n_new = resolved.count()
    if n_new:
        resolved.write.mode("append").parquet(f"{index_dir}/deletes")
    resolved.unpersist()

    man = read_manifest(index_dir)
    assert man is not None
    counts = {
        r["segment_id"]: r["n"]
        for r in deletes_df(spark, index_dir)
        .groupBy("segment_id")
        .agg(F.count("*").alias("n"))
        .collect()
    } if os.path.isdir(f"{index_dir}/deletes") else {}
    segs = []
    for s in man.segments:
        s = dict(s)
        s["deleted_docs"] = int(counts.get(s["segment_id"], 0))
        segs.append(s)
    # replace() carries EVERY manifest attribute forward (a hand-copied
    # field list silently reset with_payloads/postings_codec on delete
    # publish, corrupting payload reads / packed decodes)
    from dataclasses import replace

    write_manifest(index_dir, replace(man, segments=segs))
    return n_new


def deletion_ratio(segment: dict) -> float:
    """Cleanup-policy input (`index_utils.hpp` cleanup at ratio >= 0.5)."""
    docs = segment.get("docs") or 0
    if not docs:
        return 0.0
    return (segment.get("deleted_docs") or 0) / docs


def plan_cleanup(segments: list[dict], min_ratio: float = 0.5) -> list[int]:
    """Segments whose deletion ratio justifies a purge rewrite
    (the reference alternates tier merges with this cleanup policy)."""
    return sorted(
        s["segment_id"]
        for s in segments
        if deletion_ratio(s) >= min_ratio
    )
