"""Task-retry determinism proof — the failure mode a 1000-executor
cluster hits daily (spot preemption, OOM-killed executor, disk fault):
a task attempt dies AFTER doing work, the scheduler re-runs it, and the
job's RESULT must be as if the failure never happened (no duplicated or
dropped rows from the retried partition).

Local mode defaults to spark.task.maxFailures=1 (first failure kills
the job), so the harness session can't exercise retries — this probe
runs under master local[8,2] (2 attempts) in its own process. The
kernel is an Arrow-batched mapInPandas aggregation over lineitem whose
FIRST attempt on one chosen partition raises mid-stream after yielding
a partial batch — the nastiest shape, because a naive sink that
consumed eagerly would have seen rows from the doomed attempt. Spark's
shuffle/result semantics discard the failed attempt's output wholesale;
the assertion is byte-equality of the aggregated result with and
without the planted fault, plus a count of observed retries > 0.

Prints one JSON line: {"rows_match": bool, "fault_attempts": int,
"n_rows": int}. Exit 0 iff rows_match and a retry actually happened
(a silent no-fault run would vacuously pass otherwise).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[8,2]")  # maxFailures=2: 1 retry
        .appName("task_retry_proof")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    li = (
        spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        .select("l_orderkey", "l_quantity")
        .repartition(8, "l_orderkey")
    )

    marker = "/tmp/pws_retry_marker"

    def make_kernel(faulty: bool):
        def kernel(batches):
            import pandas as pd
            from pyspark import TaskContext

            ctx = TaskContext.get()
            first = True
            for pdf in batches:
                agg = pdf.groupby("l_orderkey", as_index=False)[
                    "l_quantity"
                ].sum()
                yield pd.DataFrame(
                    {
                        "l_orderkey": agg["l_orderkey"],
                        "part_qty": agg["l_quantity"],
                    }
                )
                if (
                    faulty
                    and first
                    and ctx.partitionId() == 3
                    and ctx.attemptNumber() == 0
                ):
                    # record that the fault fired, then die mid-stream —
                    # AFTER emitting a batch, so the retry must not
                    # double-count it
                    with open(marker, "a") as fh:
                        fh.write("x\n")
                    raise RuntimeError("planted executor fault")
                first = False

        return kernel

    schema = "l_orderkey bigint, part_qty double"

    def run(faulty: bool):
        out = (
            li.mapInPandas(make_kernel(faulty), schema)
            .groupBy("l_orderkey")
            .agg(
                F.sum(F.col("part_qty").cast("decimal(18,2)")).alias(
                    "total_qty"
                )
            )
        )
        return sorted(map(tuple, out.collect()))

    if os.path.exists(marker):
        os.remove(marker)
    clean = run(faulty=False)
    faulted = run(faulty=True)
    n_faults = 0
    if os.path.exists(marker):
        with open(marker) as fh:
            n_faults = sum(1 for _ in fh)
        os.remove(marker)

    result = {
        "rows_match": clean == faulted,
        "fault_attempts": n_faults,
        "n_rows": len(clean),
    }
    print(json.dumps(result))
    spark.stop()
    sys.exit(0 if result["rows_match"] and n_faults > 0 else 1)


if __name__ == "__main__":
    main()
