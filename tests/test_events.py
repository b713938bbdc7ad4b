"""Sessionization + as-of join semantics on hand-built event rows."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from iresearch_spark.pipeline.events import asof_join_last_event, sessionize


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: three events, 2nd exactly at the 30-min gap (same
        # session: boundary is STRICTLY greater), 3rd 31 min later (new)
        (1, 1, _ts(0), "click", 1.0),
        (2, 1, _ts(30), "view", 2.0),
        (3, 1, dt.datetime(2024, 1, 1, 1, 1), "error", 3.0),
        # user 2: error BEFORE any click -> last_src_ts null; then a click
        # at the same ts as a later error -> inclusive match
        (4, 2, _ts(5), "error", 1.0),
        (5, 2, _ts(10), "click", 1.0),
        (6, 2, _ts(10), "error", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )


def test_sessionize_gap_boundary(events):
    out = sessionize(events, gap_minutes=30).orderBy("user_id", "session_num")
    rows = [(r.user_id, r.session_num, r.n_events) for r in out.collect()]
    assert rows == [(1, 1, 2), (1, 2, 1), (2, 1, 3)]


def test_sessionize_aggregates(events):
    out = {
        (r.user_id, r.session_num): r
        for r in sessionize(events, gap_minutes=30).collect()
    }
    s = out[(1, 1)]
    assert s.session_start == "2024-01-01 00:00:00"
    assert s.session_end == "2024-01-01 00:30:00"
    assert s.sum_value == 3.0


def test_asof_join(events):
    out = {
        r.event_id: r.last_src_ts
        for r in asof_join_last_event(events, "error", "click").collect()
    }
    assert out[3] == "2024-01-01 00:00:00"  # user 1's only click
    assert out[4] is None                   # no click before it
    assert out[6] == "2024-01-01 00:10:00"  # same-ts click matches
