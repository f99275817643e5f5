"""Structured Streaming layer tests (SURVEY.md §7.2 step 8).

Correctness contract: a streaming query's final result over a bounded
source equals the batch query over the same data. The stream is fed the
events table split across multiple files with maxFilesPerTrigger=1, so
the aggregation really runs incrementally across micro-batches.
"""

from __future__ import annotations

import pytest

from bigdatacw1_spark.sources.catalog import load_table
from bigdatacw1_spark.streaming.windows import (
    run_windowed_stream_to_memory,
    session_aggregate,
    sliding_counts,
    tumbling_counts,
)
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """events at sf0.001, rewritten as a 4-file µs-timestamp parquet dir
    (the shape a streaming file source ingests)."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, SF_SMALL, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def _rows(df, key_cols):
    return sorted(tuple(r) for r in df.collect())


def test_stream_batch_equivalence_tumbling(spark, events_dir):
    q = run_windowed_stream_to_memory(spark, events_dir, table_name="t_out", minutes=10)
    q.awaitTermination(120)
    static = spark.read.parquet(events_dir)
    expected = _rows(tumbling_counts(static, minutes=10), None)
    got = _rows(spark.table("t_out"), None)
    assert got == expected
    assert len(got) > 0


def test_streaming_runs_in_multiple_batches(spark, events_dir):
    q = run_windowed_stream_to_memory(spark, events_dir, table_name="t_multi", minutes=10)
    q.awaitTermination(120)
    # maxFilesPerTrigger=1 over a 4-file dir → >1 micro-batch executed
    assert len(q.recentProgress) > 1


def test_sliding_each_event_in_two_windows(spark):
    ev = load_table(spark, SF_SMALL, "events")
    n_events = ev.count()
    slid = sliding_counts(ev, width_min=10, slide_min=5)
    total = sum(r["n"] for r in slid.collect())
    assert total == 2 * n_events


def test_session_windows_respect_gap(spark):
    ev = load_table(spark, SF_SMALL, "events")
    sess = session_aggregate(ev, gap_minutes=30).collect()
    assert sum(s["n_events"] for s in sess) == ev.count()
    # session_end is always >= session_start + gap (end = last event + gap)
    for s in sess:
        assert (s["session_end"] - s["session_start"]).total_seconds() >= 30 * 60
