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
no task carries more than max(hottest term, average bucket). For terms that
outgrow a single blob, ``shard_docs`` splits the merged posting list into
several disjoint doc-range rows (block-aligned); the query kernel and WAND
are shard-aware, and re-merges of sharded rows restore doc order via a
first-block-doc tiebreak.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from iresearch_spark.codec import (
    decode_payloads,
    encode_payloads_batch,
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


def _live(s: dict) -> int:
    return int(s.get("docs") or 0) - int(s.get("deleted_docs") or 0)


def plan_bytes(segments: list[dict], threshold: float = 0.5) -> list[int]:
    """ConsolidateBytes (`index_utils.cpp:52-82`): merge a segment if
    ``threshold > segment_bytes / (all_segment_bytes / #segments)`` — i.e.
    everything smaller than ``threshold`` x the average segment size."""
    if not segments:
        return []
    t = min(max(float(threshold), 0.0), 1.0)
    avg = sum(s["postings_bytes"] for s in segments) / len(segments)
    return sorted(
        s["segment_id"] for s in segments if avg * t >= s["postings_bytes"]
    )


def plan_bytes_accum(segments: list[dict], threshold: float = 0.5) -> list[int]:
    """ConsolidateBytesAccum (`index_utils.cpp:84-122`): smallest-first
    greedy pack while ``(candidate_bytes_sum) <= threshold *
    all_segment_bytes``; sizes are live-scaled (SizeWithoutRemovals)."""
    t = min(max(float(threshold), 0.0), 1.0)
    sized = []
    for s in segments:
        docs = int(s.get("docs") or 0)
        scale = (_live(s) / docs) if docs else 1.0
        sized.append((s["postings_bytes"] * scale, s["segment_id"]))
    budget = sum(sz for sz, _ in sized) * t
    acc, out = 0.0, []
    for sz, sid in sorted(sized):
        if acc + sz <= budget:
            acc += sz
            out.append(sid)
    return sorted(out)


def plan_count(segments: list[dict], threshold: int | None = None) -> list[int]:
    """ConsolidateCount (`index_utils.cpp:124-134`): merge the first
    ``threshold`` segments in reader order (ascending segment_id)."""
    ids = sorted(s["segment_id"] for s in segments)
    return ids if threshold is None else ids[: int(threshold)]


def plan_docs_live(segments: list[dict], threshold: float = 0.5) -> list[int]:
    """ConsolidateDocsLive (`index_utils.cpp:159-`): merge a segment if
    ``threshold >= live_docs / (all_live_docs / #segments)`` — small-by-live
    -docs segments, plus fully-dead ones unconditionally."""
    if not segments:
        return []
    t = min(max(float(threshold), 0.0), 1.0)
    avg = sum(_live(s) for s in segments) / len(segments)
    return sorted(
        s["segment_id"]
        for s in segments
        if _live(s) == 0 or avg * t >= _live(s)
    )


def plan_docs_fill(segments: list[dict], threshold: float = 0.5) -> list[int]:
    """ConsolidateDocsFill (`index_utils.cpp:136-157`): merge a segment if
    ``threshold >= live_docs / total_docs`` (fill factor), plus fully-dead
    segments unconditionally."""
    t = min(max(float(threshold), 0.0), 1.0)
    out = []
    for s in segments:
        docs = int(s.get("docs") or 0)
        if _live(s) == 0 or (docs and docs * t >= _live(s)):
            out.append(s["segment_id"])
    return sorted(out)


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    seg_ids: Sequence[int],
    bucket_count: int = 64,
    cleanup: bool = True,
    hot_term_bytes: int = 64 << 20,
    shard_docs: int | None = None,
) -> dict:
    """Merge the given segments into one new segment; returns merge metrics.

    Tombstoned docs (deletes table) are PURGED: the per-segment doc-id maps
    drop masked docs and re-number the survivors densely, exactly the
    reference's ``doc_id_map`` remap (`merge_writer.cpp:1448-`).

    ``shard_docs``: when set, a term whose merged posting list exceeds this
    many docs is written as multiple disjoint doc-range rows (block-aligned)
    instead of one giant blob — the two-level escalation for terms that
    outgrow a single blob at 10^12-doc scale. Query side is shard-aware
    (executor concatenates; WAND skips per shard). Already-sharded input
    rows re-merge correctly (ordered by each row's first-block doc)."""
    import glob
    import os
    import shutil

    man = read_manifest(index_dir)
    assert man is not None
    from iresearch_spark.codec import postings_codec

    codec_mod = postings_codec(getattr(man, "postings_codec", "varint"))
    pos_mod = postings_codec(getattr(man, "positions_codec", "varint"))
    # public API: normalize — remap base offsets accumulate in iteration
    # order, which MUST be ascending segment_id to match merge_bucket's sort
    seg_ids = sorted({int(s) for s in seg_ids})
    by_id = {s["segment_id"]: s for s in man.segments}
    new_id = max(max(by_id) + 1, man.num_segments)

    # DRIVER STATE IS O(tombstones + K), never O(docs): doc ids are dense
    # 1..docs per segment (build/merge invariant), so the reference's
    # doc_id_map (`merge_writer.cpp:1448-`) degenerates to per-segment BASE
    # OFFSETS; with deletes, the dense renumber is
    # ``new = base + old - #(deleted <= old)`` computed from the (small)
    # sorted tombstone list — no docmeta collect.
    deleted: dict[int, np.ndarray] = {}
    if os.path.isdir(f"{index_dir}/deletes"):
        from iresearch_spark.index.deletes import deletes_df

        dpdf = (
            deletes_df(spark, index_dir)
            .filter(F.col("segment_id").isin(list(seg_ids)))
            .toPandas()
        )
        for sid, g in dpdf.groupby("segment_id"):
            deleted[int(sid)] = np.sort(g["doc_id"].to_numpy(np.int64))

    bases: dict[int, int] = {}
    acc = 0
    for sid in seg_ids:
        bases[sid] = acc
        n_docs_seg = int(by_id[sid]["docs"])
        acc += n_docs_seg - int(deleted.get(sid, np.empty(0)).size)
    total_docs = acc
    bc = spark.sparkContext.broadcast((bases, deleted))

    with_positions = man.with_positions
    with_payloads = getattr(man, "with_payloads", False)
    out_schema = (
        MERGE_SCHEMA + ", pay_lens binary, payloads binary"
        if with_payloads
        else MERGE_SCHEMA
    )

    def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(
                columns=[c.split()[0] for c in out_schema.split(", ")]
            )
        bases_l, deleted_l = bc.value
        # first-block doc as tiebreak: input segments may already carry
        # SHARDED rows for a term; doc order must ascend across shards so
        # the delta encoder sees monotonic ids
        pdf = pdf.assign(
            _first=pdf["last_docs"].map(
                lambda a: int(a[0]) if len(a) else 0
            )
        ).sort_values(
            ["field", "term", "segment_id", "_first"], kind="stable"
        )
        fields_arr = pdf["field"].to_numpy(dtype=object)
        counts = pdf["docs_count"].to_numpy(np.int64)
        docs, freqs = codec_mod.decode_postings_many(
            list(pdf["postings"]), counts, list(pdf["block_offsets"])
        )
        row_of = np.repeat(np.arange(len(pdf), dtype=np.int64), counts)
        seg_arr = pdf["segment_id"].to_numpy(np.int64)[row_of]
        new_docs = np.zeros(len(docs), dtype=np.int64)
        for sid in np.unique(seg_arr):
            m = seg_arr == sid
            d = docs[m]
            base = bases_l[int(sid)]
            dels = deleted_l.get(int(sid))
            if dels is None or dels.size == 0:
                new_docs[m] = base + d
            else:
                pos = np.searchsorted(dels, d)
                member = (pos < dels.size) & (dels[np.minimum(pos, dels.size - 1)] == d)
                nd = base + d - np.searchsorted(dels, d, side="right")
                nd[member] = 0  # purged doc entries (tombstoned) drop out
                new_docs[m] = nd
        keep = new_docs > 0
        # conservative per-entry norm carried from the INPUT block's
        # min_norm: the WAND bound only needs min_norm <= every true dl in
        # the new block (smaller norm -> larger, still-safe upper bound), so
        # merge never touches per-doc norms — no O(docs) dl broadcast
        mn_rows = [np.asarray(x, dtype=np.int64) for x in pdf["min_norms"]]
        mn_all = (
            np.concatenate(mn_rows) if mn_rows else np.empty(0, np.int64)
        )
        blocks_per_row = (counts + 127) // 128
        block_row_offsets = np.concatenate(
            [[0], np.cumsum(blocks_per_row)]
        )[:-1]
        row_starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
        rank_in_row = np.arange(len(docs), dtype=np.int64) - np.repeat(
            row_starts, counts
        )
        dls = mn_all[block_row_offsets[row_of] + rank_in_row // 128]

        # per-output-term lengths: rows are (term, segment) sorted, so terms
        # are contiguous; ordered concat replaces the reference's heap merge
        terms = pdf["term"].to_numpy(dtype=object)
        term_change = np.empty(len(pdf), dtype=bool)
        term_change[0] = True
        # a bucket can hold rows of several (field, term) pairs — hash
        # collisions across fields land in the same bucket
        term_change[1:] = (terms[1:] != terms[:-1]) | (
            fields_arr[1:] != fields_arr[:-1]
        )
        trow_starts = np.flatnonzero(term_change)
        term_of_row = np.cumsum(term_change) - 1
        term_of_entry = term_of_row[row_of]
        n_terms = trow_starts.size
        term_lengths = np.bincount(
            term_of_entry[keep], minlength=n_terms
        ).astype(np.int64)
        nonempty = term_lengths > 0

        kept_docs = new_docs[keep]
        kept_freqs = freqs[keep]
        kept_dls = dls[keep]
        # blob sharding (the "salted two-level merge" escalation): a term
        # whose merged postings exceed ``shard_docs`` docs is written as
        # SEVERAL rows of disjoint consecutive doc ranges (block-aligned
        # chunks), bounding every blob; the query kernel concatenates
        # shards in first-doc order (executor rows_by_term)
        lengths = term_lengths[nonempty]
        meta = np.flatnonzero(nonempty)
        if shard_docs:
            exp_lengths: list[int] = []
            exp_meta: list[int] = []
            for L, mi in zip(lengths.tolist(), meta.tolist()):
                if L > shard_docs:
                    n_chunks = -(-L // shard_docs)
                    chunk = ((-(-L // n_chunks) + 127) // 128) * 128
                    rem = L
                    while rem > 0:
                        c = min(chunk, rem)
                        exp_lengths.append(c)
                        exp_meta.append(mi)
                        rem -= c
                else:
                    exp_lengths.append(int(L))
                    exp_meta.append(mi)
            lengths = np.asarray(exp_lengths, dtype=np.int64)
            meta = np.asarray(exp_meta, dtype=np.int64)
        blobs, offs, lasts, maxf, minn = codec_mod.encode_postings_batch(
            kept_docs, kept_freqs, kept_dls, lengths
        )
        out = {
            "segment_id": np.full(lengths.size, new_id, dtype=np.int32),
            "field": fields_arr[trow_starts[meta]],
            "term": terms[trow_starts[meta]],
            "docs_count": lengths.astype(np.int32),
            "total_tf": np.add.reduceat(
                kept_freqs,
                np.concatenate([[0], np.cumsum(lengths)])[:-1],
            ).astype(np.int64)
            if kept_freqs.size
            else np.empty(0, np.int64),
            "postings": blobs,
            "block_offsets": offs,
            "last_docs": lasts,
            "max_freqs": maxf,
            "min_norms": minn,
        }
        # payload indexes carry positions even when with_positions=False
        # (build gates the encoder on `with_positions or with_payloads`);
        # dropping them here would desync pay_lens/payloads from the
        # positions permutation and break term_payloads after a merge.
        # The data gate is PER OUTPUT TERM, never per bucket: a bucket
        # holds many (field, term) pairs (xxhash64 % bucket_count), so a
        # mixed multi-field payload index built with with_positions=False
        # can land positions-bearing rows (payload field) and null rows
        # (plain fields) in the SAME bucket. Null rows get zero
        # placeholders through the shared permutation and their output
        # terms are nulled back out below, mirroring the payload branch.
        has_pos = (
            pdf["positions"].notna().to_numpy()
            if "positions" in pdf.columns
            else np.zeros(len(pdf), dtype=bool)
        )
        if (with_positions or with_payloads) and has_pos.any():
            # one cross-row vectorized decode of the whole bucket (the
            # codec's many-row entry point: varint concatenates the
            # self-delimiting streams; packed width-groups the chunks of
            # every row at once — a per-row decode loop measured 3.2x
            # slower). None rows (mixed multi-field buckets) come back as
            # zero placeholders through the shared permutation.
            flat_pos = pos_mod.decode_positions_many(
                pdf["positions"].tolist(),
                freqs,
                counts,
                pdf["pos_offsets"].tolist()
                if "pos_offsets" in pdf.columns
                else None,
            )
            pos_keep = np.repeat(keep, freqs)
            pblobs, poffs = pos_mod.encode_positions_batch(
                kept_freqs, flat_pos[pos_keep], lengths
            )
            # an output term's rows all come from one (field, term) —
            # term_change splits on field — so the representative input
            # row decides whether the term really carries positions
            src_has_pos = has_pos[trow_starts[meta]]
            if src_has_pos.all():
                out["positions"] = pblobs
                out["pos_offsets"] = poffs
            else:
                out["positions"] = [
                    b if src_has_pos[j] else None
                    for j, b in enumerate(pblobs)
                ]
                out["pos_offsets"] = [
                    o if src_has_pos[j] else None
                    for j, o in enumerate(poffs)
                ]
        else:
            out["positions"] = None
            out["pos_offsets"] = None
        if with_payloads:
            # payloads ride the positions permutation: per-row decode (each
            # row's pay blobs are standalone), row-order concat == the
            # occurrence order of `freqs`, then the same keep mask. Rows of
            # non-payload fields (mixed multi-field index) carry null pay
            # blobs: their occurrences get b'' placeholders and the output
            # row's pay columns are nulled back out below.
            row_starts_posting = np.concatenate([[0], np.cumsum(counts)])[:-1]
            has_pay = pdf["pay_lens"].notna().to_numpy()
            pays = []
            for i in range(len(pdf)):
                f_row = freqs[
                    row_starts_posting[i] : row_starts_posting[i] + counts[i]
                ]
                if has_pay[i]:
                    pays.append(
                        decode_payloads(
                            pdf["pay_lens"].iloc[i],
                            pdf["payloads"].iloc[i],
                            f_row,
                        )
                    )
                else:
                    pays.append(np.full(int(f_row.sum()), b"", dtype=object))
            flat_pay = (
                np.concatenate(pays) if pays else np.empty(0, dtype=object)
            )
            pos_keep_pay = np.repeat(keep, freqs)
            lb, db = encode_payloads_batch(
                kept_freqs, flat_pay[pos_keep_pay], lengths
            )
            # an output term's rows all come from one field (term_change
            # splits on field), so the representative input row decides
            src_has_pay = has_pay[trow_starts[meta]]
            out["pay_lens"] = [
                b if src_has_pay[j] else None for j, b in enumerate(lb)
            ]
            out["payloads"] = [
                b if src_has_pay[j] else None for j, b in enumerate(db)
            ]
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
            schema=out_schema,
        )
    )
    merged.write.mode("append").partitionBy("segment_id").parquet(
        f"{index_dir}/segments"
    )

    # docmeta remap: DISTRIBUTED dense renumber (no driver collect) — live
    # docs get ``base_offset + row_number() over (segment, order by doc_id)``,
    # exactly the kernel's searchsorted arithmetic over dense ids
    dm_src = spark.read.parquet(f"{index_dir}/docmeta").filter(
        F.col("segment_id").isin(list(seg_ids))
    )
    if deleted:
        from iresearch_spark.index.deletes import deletes_df

        dm_src = dm_src.join(
            F.broadcast(deletes_df(spark, index_dir)),
            ["segment_id", "doc_id"],
            "anti",
        )
    base_map = F.create_map(
        *[F.lit(x) for sid in seg_ids for x in (sid, bases[sid])]
    )
    rn = F.row_number().over(
        Window.partitionBy("segment_id").orderBy("doc_id")
    )
    dm_new = (
        dm_src.withColumn(
            "new_doc_id",
            (base_map[F.col("segment_id")] + rn).cast("int"),
        )
        .withColumn("doc_id", F.col("new_doc_id"))
        .drop("new_doc_id")
        .withColumn("segment_id", F.lit(new_id).cast("int"))
    )
    dm_new.write.mode("append").partitionBy("segment_id").parquet(
        f"{index_dir}/docmeta"
    )

    # stats + manifest update (per-field doc stats from the rewritten
    # docmeta — one distributed agg, nothing driver-side but K scalars)
    sstats = (
        spark.read.parquet(f"{index_dir}/segments")
        .filter(F.col("segment_id") == new_id)
        .agg(
            # distinct (field, term): with shard_docs a big term is written
            # as several rows; the dictionary-size stat must count it once
            F.countDistinct("field", "term").alias("terms"),
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
    extra_names = [
        name for name, _ in man.field_specs() if name != man.field_name
    ]
    field_aggs = []
    for name in extra_names:
        c = F.col(f"dl_{name}")
        field_aggs.append(
            F.sum(F.when(c > 0, 1).otherwise(0)).alias(f"dwf_{name}")
        )
        field_aggs.append(F.sum(c).alias(f"ttf_{name}"))
    dstats = (
        spark.read.parquet(f"{index_dir}/docmeta")
        .filter(F.col("segment_id") == new_id)
        .agg(
            F.sum(F.when(F.col("dl") > 0, 1).otherwise(0)).alias("dwf"),
            F.sum("dl").alias("ttf"),
            *field_aggs,
        )
        .collect()[0]
        .asDict()
    )
    rec = {
        "segment_id": new_id,
        "field": man.field_name,
        "docs": total_docs,
        "docs_with_field": int(dstats["dwf"] or 0),
        "total_term_freq": int(dstats["ttf"] or 0),
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
    if extra_names:
        rec["fields"] = {
            name: {
                "docs_with_field": int(dstats[f"dwf_{name}"] or 0),
                "total_term_freq": int(dstats[f"ttf_{name}"] or 0),
            }
            for name in extra_names
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
            fields=man.fields,
            sort=man.sort,
            with_payloads=man.with_payloads,
            commit_payload=man.commit_payload,
            postings_codec=getattr(man, "postings_codec", "varint"),
            positions_codec=getattr(man, "positions_codec", "varint"),
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
        # purged tombstones are dead; rewrite the deletes table without them
        if deleted and os.path.isdir(f"{index_dir}/deletes"):
            from iresearch_spark.index.deletes import DELETES_SCHEMA, deletes_df

            remaining = deletes_df(spark, index_dir).filter(
                ~F.col("segment_id").isin(list(seg_ids))
            ).toPandas()
            shutil.rmtree(f"{index_dir}/deletes", ignore_errors=True)
            if len(remaining):
                spark.createDataFrame(
                    remaining, schema=DELETES_SCHEMA
                ).write.parquet(f"{index_dir}/deletes")
    bc.unpersist()
    return {
        "new_segment_id": new_id,
        "fan_in": len(seg_ids),
        "docs": total_docs,
        "terms": rec["terms"],
        "postings_bytes": rec["postings_bytes"],
    }


#: ConsolidationPolicy registry (`index_utils.cpp` MakePolicy overloads).
POLICIES = {
    "tier": plan_tier,
    "bytes": plan_bytes,
    "bytes_accum": plan_bytes_accum,
    "count": plan_count,
    "docs_live": plan_docs_live,
    "docs_fill": plan_docs_fill,
}


def consolidate(
    spark: SparkSession,
    index_dir: str,
    max_rounds: int = 10,
    policy: str = "tier",
    **policy_kwargs,
) -> list[dict]:
    """Run merges under the named policy until no candidate batch remains."""
    plan = POLICIES[policy]
    out = []
    for _ in range(max_rounds):
        man = read_manifest(index_dir)
        batch = plan(man.segments, **policy_kwargs)
        if not batch or len(batch) < 2:
            break
        out.append(merge_segments(spark, index_dir, batch))
    return out
