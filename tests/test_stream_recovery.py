"""s14q checkpoint-recovery pins: the second run must process ONLY the
newly-arrived wave (exactly-once resume — no replay of wave A), and the
journaled per-epoch row counts must partition the table exactly."""

from __future__ import annotations

import json

from presto_weather_spark.registry import all_queries
from presto_weather_spark.session import load_table
from presto_weather_spark.streaming.pipeline import recovery_journal_path


def test_recovery_processes_only_new_wave(spark, sf_dir):
    res = {
        r["event_type"]: r
        for r in all_queries()["s14q_stream_checkpoint_recovery"].fn(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    n_total = e.count()
    n_even = e.filter((e.event_id % 2) == 0).count()

    epochs = [
        json.loads(line)
        for line in open(recovery_journal_path(sf_dir))
        if line.strip()
    ]
    rows_per_epoch = [ep["rows"] for ep in epochs]
    # run 1 saw wave A only; run 2 saw wave B only; nothing was replayed
    assert sum(rows_per_epoch) == n_total
    assert rows_per_epoch[0] == n_even
    assert sum(rows_per_epoch[1:]) == n_total - n_even
    # and the recovered MV equals the batch aggregate
    from pyspark.sql import functions as F

    batch = {
        r["event_type"]: r["cnt"]
        for r in e.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert {k: v["n_events"] for k, v in res.items()} == batch
