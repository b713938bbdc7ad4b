"""Segment consolidation: tier policy + vectorized k-way merge.

The Spark reading of `core/index/merge_writer.cpp` + the tier policy of
`core/utils/index_utils.hpp:251-325`:

- **plan_tier**: driver-side Python over manifest stats. Sorts candidate
  segments by size, slides a window, and picks the candidate set with the
  best score under the reference's constraints: merged bytes <= ``max_bytes``
  (default 8 GiB per `index_utils.hpp:371-380` scaled down here), size skew
  ``max/total <= 0.4``, fan-in between ``min_segments`` and ``max_segments``.
- **merge_segments**: because doc ids are remapped by *per-segment base
  offsets* (ascending old segment id, `merge_writer.cpp:1448-`), the k-way
  term merge degenerates to an ordered concatenation per term — no heap
  needed. One ``groupBy(field, hash(term) % B)`` shuffle; each bucket kernel
  decodes ALL its posting blobs in one vectorized pass
  (``decode_postings_many``), shifts doc ids by broadcast base offsets,
  concatenates per term in segment order, and re-encodes with
  ``encode_postings_batch`` — no per-term Python.

Skew note (10^12-file scale): bucketing by term hash spreads the dictionary
uniformly, and terms whose total postings bytes exceed ``hot_term_bytes``
are promoted to a dedicated bucket each (tiny hot set -> broadcast join), so
no task carries more than max(hottest term, average bucket). A single term's
postings remain one task — the format keeps one blob per (segment, field,
term); sharding the blob itself (two-level salted merge) is the next
escalation if a single term outgrows one executor.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from iresearch_spark.codec import (
    decode_positions,
    decode_postings_many,
    encode_positions_batch,
    encode_postings_batch,
)
from iresearch_spark.index.build import SEGMENTS_SCHEMA
from iresearch_spark.index.manifest import (
    Manifest,
    read_manifest,
    write_checkpoint,
    write_manifest,
)

MERGE_SCHEMA = SEGMENTS_SCHEMA  # same table shape, new segment_id


def plan_tier(
    segments: list[dict],
    min_segments: int = 2,
    max_segments: int = 10,
    max_bytes: int = 8 << 30,
    max_skew: float = 0.4,
) -> list[int]:
    """Pick one merge batch (list of segment_ids), or [] if nothing qualifies.

    Reference scoring (index_utils.hpp:251-325): prefer windows with more
    segments and lower size skew.
    """
    cands = sorted(segments, key=lambda s: (s["postings_bytes"], s["segment_id"]))
    best: tuple[float, list[int]] | None = None
    n = len(cands)
    for i in range(n):
        for w in range(min_segments, max_segments + 1):
            if i + w > n:
                break
            window = cands[i : i + w]
            total = sum(s["postings_bytes"] for s in window)
            if total > max_bytes or total == 0:
                continue
            skew = max(s["postings_bytes"] for s in window) / total
            if skew > max_skew and w > 1:
                continue
            score = w - skew  # more segments, less skew
            ids = [s["segment_id"] for s in window]
            if best is None or score > best[0]:
                best = (score, ids)
    return sorted(best[1]) if best else []


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    seg_ids: Sequence[int],
    bucket_count: int = 64,
    cleanup: bool = True,
    hot_term_bytes: int = 64 << 20,
) -> dict:
    """Merge the given segments into one new segment; returns merge metrics."""
    import glob
    import os
    import shutil

    man = read_manifest(index_dir)
    assert man is not None
    seg_ids = sorted(int(s) for s in seg_ids)
    by_id = {s["segment_id"]: s for s in man.segments}
    new_id = max(max(by_id) + 1, man.num_segments)

    # base offsets: ascending old segment id (merge_writer doc-id remap)
    bases: dict[int, int] = {}
    acc = 0
    for sid in seg_ids:
        bases[sid] = acc
        acc += by_id[sid]["docs"]
    total_docs = acc

    # broadcast per-segment dl arrays (bounded: fan-in * segment_docs_max)
    dm = (
        spark.read.parquet(f"{index_dir}/docmeta")
        .filter(F.col("segment_id").isin(list(seg_ids)))
        .select("segment_id", "doc_id", "dl")
        .toPandas()
    )
    dl_maps: dict[int, np.ndarray] = {}
    for sid, g in dm.groupby("segment_id"):
        arr = np.zeros(int(g["doc_id"].max()) + 1, dtype=np.int64)
        arr[g["doc_id"].to_numpy()] = g["dl"].to_numpy()
        dl_maps[int(sid)] = arr
    bc = spark.sparkContext.broadcast((bases, dl_maps))

    with_positions = man.with_positions

    def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                columns=[c.split()[0] for c in MERGE_SCHEMA.split(", ")]
            )
        bases_l, dl_l = bc.value
        pdf = pdf.sort_values(["field", "term", "segment_id"], kind="stable")
        field = pdf["field"].iloc[0]
        counts = pdf["docs_count"].to_numpy(np.int64)
        docs, freqs = decode_postings_many(list(pdf["postings"]), counts)
        row_of = np.repeat(np.arange(len(pdf), dtype=np.int64), counts)
        seg_arr = pdf["segment_id"].to_numpy(np.int64)[row_of]
        base_arr = np.zeros(len(docs), dtype=np.int64)
        dls = np.zeros(len(docs), dtype=np.int64)
        for sid in np.unique(seg_arr):
            m = seg_arr == sid
            base_arr[m] = bases_l[int(sid)]
            dls[m] = dl_l[int(sid)][docs[m]]
        new_docs = docs + base_arr

        # per-output-term lengths: rows are (term, segment) sorted, so terms
        # are contiguous; ordered concat replaces the reference's heap merge
        terms = pdf["term"].to_numpy(dtype=object)
        term_change = np.empty(len(pdf), dtype=bool)
        term_change[0] = True
        term_change[1:] = terms[1:] != terms[:-1]
        trow_starts = np.flatnonzero(term_change)
        rows_per_term = np.diff(np.append(trow_starts, len(pdf)))
        cum_counts = np.concatenate([[0], np.cumsum(counts)])
        term_lengths = (
            cum_counts[np.append(trow_starts[1:], len(pdf))]
            - cum_counts[trow_starts]
        )
        blobs, offs, lasts, maxf, minn = encode_postings_batch(
            new_docs, freqs, dls, term_lengths
        )
        out = {
            "segment_id": np.full(term_lengths.size, new_id, dtype=np.int32),
            "field": field,
            "term": terms[trow_starts],
            "docs_count": term_lengths.astype(np.int32),
            "total_tf": np.add.reduceat(
                freqs, np.concatenate([[0], np.cumsum(term_lengths)])[:-1]
            ).astype(np.int64),
            "postings": blobs,
            "block_offsets": offs,
            "last_docs": lasts,
            "max_freqs": maxf,
            "min_norms": minn,
        }
        if with_positions and "positions" in pdf.columns:
            pos_concat = b"".join(pdf["positions"])
            flat_pos = decode_positions(pos_concat, freqs)
            pblobs, poffs = encode_positions_batch(freqs, flat_pos, term_lengths)
            out["positions"] = pblobs
            out["pos_offsets"] = poffs
        else:
            out["positions"] = None
            out["pos_offsets"] = None
        return pd.DataFrame(out)

    seg_df = spark.read.parquet(f"{index_dir}/segments").filter(
        F.col("segment_id").isin(list(seg_ids))
    )
    # Hot-term skew: Zipfian terms (`import`, `int`) can dominate a hash
    # bucket and straggle the whole merge. Terms whose total postings bytes
    # exceed hot_term_bytes get a dedicated bucket each (the hot set is tiny
    # -> broadcast join); everything else hashes uniformly. A single term's
    # postings stay in one task — the storage format keeps one blob per
    # (segment, field, term) — so the per-task bound is max(hottest term,
    # average bucket), the best achievable without sharding the blob.
    hot = (
        seg_df.groupBy("field", "term")
        .agg(F.sum(F.length("postings")).alias("hot_bytes"))
        .filter(F.col("hot_bytes") > hot_term_bytes)
        .select(
            "field",
            "term",
            (
                F.row_number().over(
                    Window.orderBy("field", "term")
                ) + F.lit(bucket_count)
            ).alias("solo_bucket"),
        )
    )
    merged = (
        seg_df.join(F.broadcast(hot), ["field", "term"], "left")
        .withColumn(
            "bucket",
            F.coalesce(
                F.col("solo_bucket"),
                F.pmod(F.xxhash64("field", "term"), F.lit(bucket_count)),
            ),
        )
        .drop("solo_bucket")
        .groupBy("bucket")
        .applyInPandas(
            lambda key, pdf: merge_bucket(pdf.drop(columns=["bucket"])),
            schema=MERGE_SCHEMA,
        )
    )
    merged.write.mode("append").partitionBy("segment_id").parquet(
        f"{index_dir}/segments"
    )

    # docmeta remap
    base_map = F.create_map(
        *[F.lit(x) for kv in bases.items() for x in kv]
    )
    dm_new = (
        spark.read.parquet(f"{index_dir}/docmeta")
        .filter(F.col("segment_id").isin(list(seg_ids)))
        .withColumn("doc_id", (F.col("doc_id") + base_map[F.col("segment_id")]).cast("int"))
        .withColumn("segment_id", F.lit(new_id).cast("int"))
    )
    dm_new.write.mode("append").partitionBy("segment_id").parquet(
        f"{index_dir}/docmeta"
    )

    # stats + manifest update
    sstats = (
        spark.read.parquet(f"{index_dir}/segments")
        .filter(F.col("segment_id") == new_id)
        .agg(
            F.count("*").alias("terms"),
            F.sum("docs_count").alias("sum_doc_freq"),
            F.sum(F.length("postings")).alias("postings_bytes"),
            F.min("term").alias("min_term"),
            F.max("term").alias("max_term"),
            F.expr("bit_xor(xxhash64(term, docs_count, total_tf, postings))").alias(
                "content_hash"
            ),
        )
        .collect()[0]
        .asDict()
    )
    rec = {
        "segment_id": new_id,
        "field": man.field_name,
        "docs": total_docs,
        "docs_with_field": sum(by_id[s]["docs_with_field"] for s in seg_ids),
        "total_term_freq": sum(by_id[s]["total_term_freq"] for s in seg_ids),
        "terms": int(sstats["terms"] or 0),
        "sum_doc_freq": int(sstats["sum_doc_freq"] or 0),
        "postings_bytes": int(sstats["postings_bytes"] or 0),
        "min_term": sstats["min_term"],
        "max_term": sstats["max_term"],
        "content_hash": int(sstats["content_hash"] or 0),
        "lineage": {
            "merged_from": list(seg_ids),
            "fan_in": len(seg_ids),
            "generation": 1 + max(
                by_id[s]["lineage"].get("generation", 0) for s in seg_ids
            ),
        },
    }
    write_checkpoint(index_dir, rec)
    new_segments = [s for s in man.segments if s["segment_id"] not in set(seg_ids)]
    new_segments.append(rec)
    write_manifest(
        index_dir,
        Manifest(
            format_version=man.format_version,
            num_segments=man.num_segments,
            field_name=man.field_name,
            analyzer=man.analyzer,
            with_positions=man.with_positions,
            segments=new_segments,
        ),
    )
    if cleanup:
        for sub in ("segments", "docmeta"):
            for sid in seg_ids:
                for d in glob.glob(f"{index_dir}/{sub}/segment_id={sid}"):
                    shutil.rmtree(d, ignore_errors=True)
        for sid in seg_ids:
            p = f"{index_dir}/checkpoints/seg-{sid:06d}.json"
            if os.path.exists(p):
                os.remove(p)
    bc.unpersist()
    return {
        "new_segment_id": new_id,
        "fan_in": len(seg_ids),
        "docs": total_docs,
        "terms": rec["terms"],
        "postings_bytes": rec["postings_bytes"],
    }


def consolidate(
    spark: SparkSession, index_dir: str, max_rounds: int = 10, **tier_kwargs
) -> list[dict]:
    """Run tier-policy merges until no candidate batch remains."""
    out = []
    for _ in range(max_rounds):
        man = read_manifest(index_dir)
        batch = plan_tier(man.segments, **tier_kwargs)
        if not batch or len(batch) < 2:
            break
        out.append(merge_segments(spark, index_dir, batch))
    return out
