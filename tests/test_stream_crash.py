"""Mid-batch hard-kill crash consistency for the exactly-once sink.

test_stream_recovery.py proves clean restarts; this proves the DIRTY one:
the query dies between the batch data write and the commit (the planted
exception inside foreachBatch — the exact window a node crash hits in a
two-phase file sink). After restart, readers must see each input row
exactly once: the orphan data from the crashed attempt stays on disk but
is invisible (readers consume only manifest-committed paths), and the
replayed batch commits once.
"""

from __future__ import annotations

import glob
import os
import shutil
import uuid

import pytest
from pyspark.sql import functions as F

from presto_weather_spark.session import load_table
from presto_weather_spark.streaming.pipeline import (
    events_stream,
    exactly_once_sink_read,
    exactly_once_sink_run,
)


def test_crash_between_write_and_commit_yields_exactly_once(spark, sf_dir):
    base = f"/tmp/pws_crash_{uuid.uuid4().hex[:12]}"
    out = events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type"
    )
    try:
        # run 1: hard-kill mid-batch — AFTER the data write, BEFORE commit
        with pytest.raises(Exception) as exc:
            exactly_once_sink_run(out, base, fail_after_write_on_batch=0)
        assert "planted crash" in str(exc.value)

        # the crash window is real: orphan attempt data exists on disk...
        orphans = glob.glob(os.path.join(base, "data", "batch=0", "attempt-*"))
        assert len(orphans) == 1, orphans
        # ...but nothing is committed, so readers see zero rows — AND the
        # empty frame carries the real sink projection (persisted schema),
        # so downstream selects/unions analyze on the crash path too
        empty = exactly_once_sink_read(spark, base)
        assert empty.count() == 0
        assert empty.columns == ["event_id", "user_id", "event_type"]
        assert empty.select("user_id", "event_type").count() == 0

        # run 2: restart with the same checkpoint — the failed batch replays
        exactly_once_sink_run(out, base)

        # exactly-once: committed output equals the batch projection, no
        # duplicates from the replay, no partial rows from the orphan
        committed = exactly_once_sink_read(spark, base)
        n_events = load_table(spark, sf_dir, "events").count()
        assert committed.count() == n_events
        assert (
            committed.select("event_id").distinct().count() == n_events
        ), "replayed batch leaked duplicate rows"

        # both attempts remain on disk (no atomic rename assumed), exactly
        # one is committed — the manifest is the only source of truth
        attempts = glob.glob(os.path.join(base, "data", "batch=0", "attempt-*"))
        assert len(attempts) == 2, attempts
        manifest = open(os.path.join(base, "manifest.jsonl")).read()
        assert manifest.count('"batch_id": 0') == 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_committed_replay_is_a_noop(spark, sf_dir):
    # a THIRD start over a fully-committed checkpoint must add nothing —
    # neither new attempts nor new manifest records (the replay guard).
    base = f"/tmp/pws_crash_{uuid.uuid4().hex[:12]}"
    out = events_stream(spark, sf_dir).select("event_id")
    try:
        exactly_once_sink_run(out, base)
        before = sorted(glob.glob(os.path.join(base, "data", "*", "*")))
        manifest_before = open(os.path.join(base, "manifest.jsonl")).read()
        exactly_once_sink_run(out, base)
        after = sorted(glob.glob(os.path.join(base, "data", "*", "*")))
        assert before == after
        assert open(os.path.join(base, "manifest.jsonl")).read() == manifest_before
        n = load_table(spark, sf_dir, "events").count()
        assert exactly_once_sink_read(spark, base).count() == n
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_empty_sink_read_legacy_fallback(spark):
    # A pre-round-9 sink directory has no _schema.json; the reader must
    # still return the legacy single-column empty frame instead of dying.
    base = f"/tmp/pws_crash_{uuid.uuid4().hex[:12]}"
    os.makedirs(base)
    try:
        legacy = exactly_once_sink_read(spark, base)
        assert legacy.columns == ["event_id"]
        assert legacy.count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)
