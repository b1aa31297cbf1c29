"""Event-time TIMEOUT in applyInPandasWithState: state that stops
receiving data must be expired BY THE WATERMARK, with the operator given
one final hasTimedOut callback to emit the closed session.

s14e covers the accumulate path (NoTimeout); this pins the expiry path:
run 1 opens user 1's session and checkpoints; run 2 carries only a
much-later event for user 2 — its trailing no-data batch runs with the
advanced watermark, past user 1's timeout stamp, and the operator must
receive hasTimedOut for user 1 (no fresh data for that key) and emit
the closed session.

Unit trap pinned here: ``setTimeoutTimestamp`` takes epoch MILLIseconds,
and Arrow hands the pandas ``ts`` column over in ns or us depending on
pandas version — normalize via ``astype("datetime64[us]")`` first. A
wrong unit silently produces a far-future timeout that never fires.
"""

import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F

HOUR_US = 3600 * 1_000_000
T0 = 1_700_000_000 * 1_000_000


def _write(path, rows):
    ids, users, tss = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "user_id": pa.array(users, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("us")),
            }
        ),
        path,
    )


def test_event_time_timeout_emits_closed_session(spark):
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    base = f"/tmp/pws_tmo_{uuid.uuid4().hex[:8]}"
    src, sink, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)

    def sessions(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            n, first_us, last_us = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "n_events": [n],
                    "duration_s": [(last_us - first_us) // 1_000_000],
                    "closed_by": ["timeout"],
                }
            )
            return
        n, first_us, last_us = (state.get if state.exists else (0, None, None))
        for pdf in pdfs:
            us = pdf["ts"].astype("datetime64[us]").astype("int64")
            n += len(pdf)
            first_us = int(us.min()) if first_us is None else min(first_us, int(us.min()))
            last_us = int(us.max()) if last_us is None else max(last_us, int(us.max()))
        state.update((n, first_us, last_us))
        # expire 2h of EVENT time after the last seen event (epoch ms)
        state.setTimeoutTimestamp(last_us // 1000 + 2 * 3600 * 1000)
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "duration_s": [(last_us - first_us) // 1_000_000],
                "closed_by": ["open"],
            }
        )

    def run_once():
        schema = spark.read.parquet(src).schema
        stream = spark.readStream.schema(schema).parquet(src)
        out = (
            stream.withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 hour")
            .groupBy("user_id")
            .applyInPandasWithState(
                sessions,
                outputStructType="user_id bigint, n_events bigint, "
                "duration_s bigint, closed_by string",
                stateStructType="n bigint, first_us bigint, last_us bigint",
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            )
        )
        q = (
            out.writeStream.outputMode("append")
            .format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(sink).collect()

    try:
        # run 1: user 1's session — two events, one hour apart
        _write(f"{src}/b1.parquet", [(1, 1, T0), (2, 1, T0 + HOUR_US)])
        r1 = {(r["user_id"], r["closed_by"]) for r in run_once()}
        assert (1, "open") in r1 and (1, "timeout") not in r1
        # run 2: only user 2, 10h later. The data batch still runs with
        # the checkpointed watermark (T0); the trailing no-data batch
        # runs with the advanced watermark (9h) > user 1's timeout stamp
        # (last+2h) -> user 1 closes by timeout within this run.
        _write(f"{src}/b2.parquet", [(3, 2, T0 + 10 * HOUR_US)])
        rows = run_once()
        closed = [
            r for r in rows if r["user_id"] == 1 and r["closed_by"] == "timeout"
        ]
        assert len(closed) == 1, rows
        assert closed[0]["n_events"] == 2 and closed[0]["duration_s"] == 3600
    finally:
        shutil.rmtree(base, ignore_errors=True)
