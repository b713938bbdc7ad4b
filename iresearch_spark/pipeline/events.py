"""Event-stream operators: sessionization and as-of join.

The reference is a batch indexer with no event-time machinery (SURVEY §2:
"Streaming: none in the reference"), but a large-scale training-data
pipeline needs event-time grouping for behavioural corpora. These two
operators are the canonical shapes:

- ``sessionize``: gap-based session windows (the Structured Streaming
  ``session_window`` semantics, expressed as batch window functions so a
  DuckDB oracle can verify them exactly).
- ``asof_join_last_event``: for every target event, the most recent
  source event for the same key at-or-before its timestamp (DuckDB
  ``ASOF JOIN`` semantics), implemented as a union + running ``last()``
  instead of a range join.

Scale notes (100 TB):
- Both operators shuffle ONCE on the entity key (``user_id``) and then run
  JVM-side window functions — no Python, no range-join explosion. A
  per-user event stream is bounded (human-generated), so per-partition
  sort memory is bounded; skewed bot users would be handled upstream by
  a count cap.
- The as-of union trick turns an O(|left| x |right|/key) range join into
  a single merge pass: sort (user, ts, kind) and carry the last source
  timestamp forward with ``last(ignorenulls)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """Assign gap-based sessions and aggregate one row per session.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_minutes``. Output: one row per (key, session_num)
    with event count, span, and value sum. Deterministic: events ordered
    by (ts, event_id) within a key.
    """
    w_order = Window.partitionBy(key).orderBy(ts, "event_id")
    gap_s = gap_minutes * 60
    prev_ts = F.lag(ts).over(w_order)
    # NTZ timestamps cannot cast to long directly; go through timestamp —
    # any session-tz shift cancels in the difference
    epoch = lambda c: c.cast("timestamp").cast("long")  # noqa: E731
    new_sess = F.when(
        prev_ts.isNull() | (epoch(F.col(ts)) - epoch(prev_ts) > gap_s),
        1,
    ).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_sess = events.withColumn("_new", new_sess).withColumn(
        "session_num", F.sum("_new").over(w_run)
    )
    return (
        with_sess.groupBy(key, "session_num")
        .agg(
            F.count("*").alias("n_events"),
            F.date_format(F.min(ts), _TS_FMT).alias("session_start"),
            F.date_format(F.max(ts), _TS_FMT).alias("session_end"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .withColumn("session_num", F.col("session_num").cast("long"))
    )


def asof_join_last_event(
    events: DataFrame,
    target_type: str = "error",
    source_type: str = "click",
    key: str = "user_id",
    ts: str = "ts",
) -> DataFrame:
    """For each ``target_type`` event, the most recent ``source_type``
    event timestamp of the same key at-or-before it (ASOF LEFT JOIN).

    Implemented without a range join: tag both event sets, union, sort by
    (key, ts, kind) with sources first on timestamp ties (matching DuckDB
    ``ASOF JOIN ... ON t.ts >= s.ts`` inclusive semantics), then carry the
    last source timestamp forward with ``last(ignorenulls=True)``.
    """
    src = (
        events.filter(F.col("event_type") == source_type)
        .select(
            key,
            F.col(ts).alias("_t"),
            F.lit(0).alias("_kind"),
            F.lit(None).cast("long").alias("event_id"),
            F.col(ts).alias("_src_ts"),
        )
    )
    tgt = (
        events.filter(F.col("event_type") == target_type)
        .select(
            key,
            F.col(ts).alias("_t"),
            F.lit(1).alias("_kind"),
            F.col("event_id").cast("long").alias("event_id"),
            F.lit(None).cast("timestamp").alias("_src_ts"),
        )
    )
    w = Window.partitionBy(key).orderBy("_t", "_kind").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    joined = (
        src.unionByName(tgt)
        .withColumn("_last_src", F.last("_src_ts", ignorenulls=True).over(w))
        .filter(F.col("_kind") == 1)
    )
    return joined.select(
        "event_id",
        F.col(key),
        F.date_format("_t", _TS_FMT).alias("event_ts"),
        F.date_format("_last_src", _TS_FMT).alias("last_src_ts"),
    )
