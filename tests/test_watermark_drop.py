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


def _write_typed(path: str, rows: list[tuple]) -> None:
    ids, tss, types, users = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us")),
                "event_type": pa.array(types, pa.string()),
                "user_id": pa.array(users, pa.int64()),
            }
        ),
        path,
    )


def test_arrival_order_permutation_invariance(spark):
    # Round-9 verdict task #5: the property 100-TB out-of-order ingestion
    # actually stresses — the SAME rows arriving in permuted order must
    # produce (a) identical closed-window counts from the s14 tumbling agg
    # and (b) the identical dedup KEY SET from the s14c dropDuplicates
    # shape, as long as lateness stays within the watermark. Three drives:
    #   A: event-time order, one run;
    #   B: full arrival shuffle (per-file scramble), one run;
    #   C: two checkpointed runs where a slice arrives a run LATE but
    #      within the watermark horizon (the cross-run case the watermark
    #      filter actually evaluates — within one run the filter uses the
    #      run-start watermark, see this module's docstring finding #1).
    # Final watermark is max(event time) - delay in every drive, so the
    # emitted window set and surviving key set are arrival-order-free.
    MIN_US = 60 * 1_000_000
    rows = [
        (i, T0 + i * MIN_US, f"type{i % 5}", i % 7) for i in range(360)
    ]

    def drive(file_lists: list[list[list[tuple]]]):
        """file_lists: one entry per RUN; each run a list of files."""
        base = f"/tmp/pws_perm_{uuid.uuid4().hex[:8]}"
        src = f"{base}/src"
        os.makedirs(src)
        schema = "event_id long, ts timestamp, event_type string, user_id long"
        win_sink, win_ckpt = f"{base}/win", f"{base}/win_ckpt"
        ded_sink, ded_ckpt = f"{base}/ded", f"{base}/ded_ckpt"
        dropped = 0
        try:
            nfile = 0
            for run_files in file_lists:
                for rs in run_files:
                    p = f"{src}/f{nfile:03d}.parquet"
                    _write_typed(p, rs)
                    os.utime(p, (1_700_000_000 + nfile, 1_700_000_000 + nfile))
                    nfile += 1
                stream = (
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src)
                )
                wm = stream.withWatermark("ts", "1 hour")
                win = (
                    wm.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .select(
                        F.col("w.start").cast("long").alias("start_s"),
                        "event_type",
                        "n",
                    )
                )
                ded = wm.dropDuplicates(["user_id", "event_type"]).select(
                    "user_id", "event_type"
                )
                for df, sink, ckpt in (
                    (win, win_sink, win_ckpt),
                    (ded, ded_sink, ded_ckpt),
                ):
                    q = (
                        df.writeStream.outputMode("append")
                        .format("parquet")
                        .option("path", sink)
                        .option("checkpointLocation", ckpt)
                        .trigger(availableNow=True)
                        .start()
                    )
                    q.awaitTermination()
                    dropped += sum(
                        op.get("numRowsDroppedByWatermark", 0)
                        for p_ in q.recentProgress
                        for op in p_["stateOperators"]
                    )
            wins = {
                (r["start_s"], r["event_type"]): r["n"]
                for r in spark.read.parquet(win_sink).collect()
            }
            keys = {
                (r["user_id"], r["event_type"])
                for r in spark.read.parquet(ded_sink).collect()
            }
            return wins, keys, dropped
        finally:
            shutil.rmtree(base, ignore_errors=True)

    # A: in event-time order, 12 files of 30 minutes each, one run
    ordered = [rows[i : i + 30] for i in range(0, 360, 30)]
    wins_a, keys_a, drop_a = drive([ordered])

    # B: bounded-lateness permutation, one run — every row shuffled within
    # its 30-min file and ~1/3 of rows displaced ONE file later (max
    # lateness ~60 min, inside the 1 h watermark delay with margin). An
    # UNBOUNDED scramble is deliberately out of contract: arrival later
    # than the delay is exactly what the watermark defines as droppable.
    files_b: list[list[tuple]] = [[] for _ in range(13)]
    for r in rows:
        f = r[0] // 30 + (1 if (r[0] * 2654435761) % 3 == 0 else 0)
        files_b[f].append(r)
    scrambled = [
        sorted(fr, key=lambda r: (r[0] * 7919) % 360) for fr in files_b if fr
    ]
    wins_b, keys_b, drop_b = drive([scrambled])

    # C: run 1 gets minutes 0-299 EXCEPT 240-299 of type0/type1 (held
    # back); run 2 delivers the held slice (now a run late, but its ts >
    # run-1 watermark 299-60=239) plus minutes 300-359.
    held = [r for r in rows if 240 <= r[0] < 300 and r[0] % 5 in (0, 1)]
    run1 = [r for r in rows if r[0] < 300 and r not in held]
    run2 = held + [r for r in rows if r[0] >= 300]
    wins_c, keys_c, drop_c = drive(
        [[run1[:150], run1[150:]], [run2[:60], run2[60:]]]
    )

    assert wins_a == wins_b == wins_c and len(wins_a) > 0
    assert keys_a == keys_b == keys_c and len(keys_a) == 35  # 7 users x 5 types
    # nothing was late past the watermark in any drive
    assert drop_a == drop_b == drop_c == 0


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
