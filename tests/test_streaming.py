from __future__ import annotations

import os
import shutil

import pytest

from lakeforge.io.sources import read_events
from lakeforge.streaming.events import (
    read_events_stream,
    run_available_now,
    windowed_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="driver testdata absent")
def test_stream_equals_batch(spark, tmp_path):
    """The same windowed_counts definition over readStream (availableNow)
    and over a batch read must produce identical results — Spark's unified
    batch/stream semantics, verified."""
    stream_dir = tmp_path / "events_in"
    stream_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", stream_dir / "part-000.parquet")

    stream = read_events_stream(spark, str(stream_dir))
    assert stream.isStreaming
    streamed = run_available_now(
        windowed_counts(stream, window="1 hour", watermark="2 hours"),
        "events_hourly_test",
    )
    batch = windowed_counts(read_events(spark, SF_DIR), window="1 hour")

    s = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert s == b
    assert len(s) > 0


@pytest.mark.skipif(not os.path.exists(SF_DIR), reason="driver testdata absent")
def test_stream_incremental_files_accumulate(spark, tmp_path):
    """Files dropped into the directory are picked up as micro-batches:
    counts after two files = counts over both."""
    stream_dir = tmp_path / "events_inc"
    stream_dir.mkdir()
    shutil.copy(f"{SF_DIR}/events.parquet", stream_dir / "a.parquet")
    shutil.copy(f"{SF_DIR}/events.parquet", stream_dir / "b.parquet")

    stream = read_events_stream(spark, str(stream_dir), max_files_per_trigger=1)
    streamed = run_available_now(
        windowed_counts(stream, window="1 hour"), "events_inc_test"
    )
    batch = windowed_counts(read_events(spark, SF_DIR), window="1 hour")
    got = {
        (r["w_start"], r["event_type"]): r["n_events"] for r in streamed.collect()
    }
    want = {
        (r["w_start"], r["event_type"]): 2 * r["n_events"] for r in batch.collect()
    }
    assert got == want
