"""True watermark semantics: rows arriving behind the watermark are dropped.

Two findings pinned here (Spark 4.1, file source):

1. WITHIN a single Trigger.AvailableNow run, the late-record filter uses
   the watermark as of RUN START (from the checkpoint) — the intra-run
   advancing watermark evicts/emits state but does NOT drop late input
   (verified: a 48h-late row sails into a fresh run; the same row is
   dropped under a processingTime trigger, numRowsDroppedByWatermark=1).
   This is why the registered single-batch s14* streams are exactly
   batch-equivalent: nothing can be late relative to a fresh checkpoint.

2. ACROSS runs sharing a checkpoint the watermark persists: a second
   availableNow run filters against the first run's final watermark.
   That cross-run drop is the production semantics and is what this test
   asserts end-to-end through a file sink.
"""

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

HOUR_US = 3600 * 1_000_000
T0 = 1_700_000_000 * 1_000_000  # µs epoch base (not hour-aligned)


def _write(path: str, rows: list[tuple[int, int]]) -> None:
    ids, tss = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us")),
            }
        ),
        path,
    )


def test_late_rows_dropped_across_checkpointed_runs(spark):
    base = f"/tmp/pws_wm_{uuid.uuid4().hex[:8]}"
    src, sink, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)

    def run_once():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour").alias("win"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("win.start").cast("long").alias("start_s"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [
            p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            if p["stateOperators"]
        ]

    try:
        # run 1: 3 events in hour 48 -> checkpoint watermark = 47h
        _write(f"{src}/b1.parquet", [(1, T0 + 48 * HOUR_US), (2, T0 + 48 * HOUR_US + 60), (3, T0 + 48 * HOUR_US + 120)])
        run_once()
        # run 2: two rows 48h BEHIND the checkpointed watermark + one
        # on-time row in hour 49 -> the late rows must be dropped
        _write(f"{src}/b2.parquet", [(4, T0), (5, T0 + 60), (6, T0 + 49 * HOUR_US)])
        dropped_run2 = run_once()
        # the filter runs at the state store AFTER map-side partial
        # aggregation, so the two late input rows arrive as ONE hour-0
        # partial row — the metric counts that aggregate row
        assert sum(dropped_run2) >= 1, dropped_run2
        # run 3: hour-60 event pushes the watermark to 59h, closing and
        # emitting the hour-48/49 windows
        _write(f"{src}/b3.parquet", [(7, T0 + 60 * HOUR_US)])
        run_once()

        got = {
            r["start_s"]: r["n"] for r in spark.read.parquet(sink).collect()
        }
        hour0_start = (T0 // 1_000_000) // 3600 * 3600
        assert got.get(hour0_start + 48 * 3600) == 3, got
        assert got.get(hour0_start + 49 * 3600) == 1, got
        # the late rows' window must never surface
        assert hour0_start not in got, got
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_dedup_within_watermark_matches_batch_keyset(spark, sf_dir):
    # s14m: with a single micro-batch the surviving key set must equal the
    # batch distinct key set (which row survives per key is arrival-order
    # dependent; the KEY SET is the invariant).
    from presto_weather_spark.registry import all_queries
    from presto_weather_spark.session import load_table

    out = all_queries()["s14m_dedup_within_watermark_ttl"].fn(spark, sf_dir)
    stream_keys = {(r["user_id"], r["event_type"]) for r in out.collect()}
    batch_keys = {
        (r["user_id"], r["event_type"])
        for r in load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .collect()
    }
    assert stream_keys == batch_keys
    assert out.count() == len(stream_keys)  # exactly one survivor per key
