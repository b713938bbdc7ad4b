"""Nested (parent/child) filter — relational mapping of ByNestedFilter.

The reference's `core/search/nested_filter.hpp:33-120` matches PARENT docs
by a predicate over their CHILD docs, with four match modes plus a merge of
child scores into the parent score (`ScoreMergeType`, scorer.hpp:223-237):

- ``kMatchAny``   -> at least one matching child        (lo=1, hi=None)
- ``kMatchNone``  -> no matching child                  (lo=0, hi=0)
- ``Match{Min,Max}`` range -> between lo and hi matching children

In the index the reference encodes parent/child adjacency in doc order and
walks both iterators in lockstep; Spark-first this is an aggregate-then-join
over an explicit key — one shuffle on the child key (map-side partial agg),
then a join against the parent table that AQE broadcasts when the matched
side is small. At 100 TB the child agg output is bounded by #parents, never
by #children, so the join side stays the smaller one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGES = {
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "avg": F.avg,  # the reference's kAverage merge
}


def nested_match(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
    lo: int = 1,
    hi: int | None = None,
    child_score=None,
    merge: str = "sum",
    score_col: str = "child_score",
    count_col: str = "n_children",
) -> DataFrame:
    """Parent rows whose matching-child count lies in [lo, hi], carrying the
    merged child score (`nested_filter.hpp` match-range + score merge).

    ``child`` should already be filtered to *matching* children (the child
    filter is an ordinary DataFrame predicate, pushed down by Catalyst).
    ``lo=0`` admits parents with NO matching child (kMatchNone when hi=0);
    their merged score is null and count 0. ``child_score``: a Column over
    the child rows to merge into the parent (None -> no score column).
    """
    if lo < 0 or (hi is not None and hi < lo):
        raise ValueError(f"bad match range [{lo}, {hi}]")
    aggs = [F.count("*").alias(count_col)]
    if child_score is not None:
        aggs.append(_MERGES[merge](child_score).alias(score_col))
    stats = child.groupBy(F.col(child_key).alias(parent_key)).agg(*aggs)
    if lo == 0:
        # parents with zero matching children must survive: left join, then
        # range-filter on the coalesced count
        joined = parent.join(stats, parent_key, "left").withColumn(
            count_col, F.coalesce(F.col(count_col), F.lit(0))
        )
    else:
        joined = parent.join(stats, parent_key)
    joined = joined.filter(F.col(count_col) >= lo)
    if hi is not None:
        joined = joined.filter(F.col(count_col) <= hi)
    return joined
