"""Shared determinism helpers for oracle-comparable queries.

Floating-point sums are order-dependent; Spark's partial aggregation order
varies run to run, while the DuckDB oracle sums sequentially.  Any double
SUM whose value lands near a rounding boundary can therefore hash-mismatch.
Fix: do the arithmetic in DECIMAL (exact, associative) and cast the final
result back to double.  Base money columns in the test data carry 2-decimal
values, so DECIMAL(18,2) casts are value-preserving.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dec(col: Column) -> Column:
    """Cast a money-style double to exact DECIMAL(18,2)."""
    return col.cast(DEC)


def dsum(col: Column) -> Column:
    """Order-independent SUM of a money column, returned as double."""
    return F.sum(col.cast(DEC)).cast("double")


def sql_dec(expr: str) -> str:
    return f"CAST({expr} AS DECIMAL(18,2))"


def sql_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,2))) AS DOUBLE)"


def sql_bigint_sum(expr: str) -> str:
    """DuckDB widens integer SUM to HUGEINT; Spark keeps BIGINT."""
    return f"CAST(SUM({expr}) AS BIGINT)"


# ---------------------------------------------------------------------------
# Session-unique scratch root for write-then-read-back queries.
#
# Queries like s02 (sink roundtrip), s33 (Z-order), s41/s42 (WAP / dynamic
# overwrite), s53 (nested pruning), and the streaming MV all stage data
# under the OS temp dir keyed only by sf-dir basename — two concurrent
# bench/pytest runs on one host would race on overwrite-vs-read.  A
# per-process token isolates each session while keeping paths stable
# WITHIN the process (so a query re-run in the same bench session reuses
# its staged data, e.g. the bucketed-join warehouse).
# ---------------------------------------------------------------------------


def scratch_root() -> str:
    """Per-process unique temp root (replaces bare tempfile.gettempdir()).

    Rooted at session.scratch_base() since round 11 — tmpfs when available,
    ``SPARK_GRAFT_SCRATCH_DIR`` on a real cluster — so staged parquet /
    warehouse data for the write-then-read-back keys stops paying disk
    writeback (guide §6)."""
    import os
    import uuid

    from presto_weather_spark.session import scratch_base

    global _SCRATCH_ROOT
    try:
        return _SCRATCH_ROOT
    except NameError:
        pass
    _SCRATCH_ROOT = os.path.join(
        scratch_base(), f"pws-session-{uuid.uuid4().hex[:12]}"
    )
    os.makedirs(_SCRATCH_ROOT, exist_ok=True)

    # Best-effort cleanup at interpreter exit so repeated bench/pytest
    # sessions don't accumulate staged parquet/warehouse data unboundedly
    # in the OS temp dir. ignore_errors: a half-removed scratch dir is
    # fine, failing the interpreter shutdown is not.
    import atexit
    import shutil

    atexit.register(shutil.rmtree, _SCRATCH_ROOT, ignore_errors=True)
    return _SCRATCH_ROOT


def grand_total_if_empty(inp, out, row: tuple):
    """Standard-SQL empty-input semantics for grouping sets (round-10
    degenerate-parity find): Spark's Expand-based rollup/cube emits ZERO
    rows on empty input, while the SQL standard's () grouping set — and
    DuckDB/Postgres — aggregate the empty table into ONE grand-total row
    (COUNT 0, NULL sums). Same for per-column profile reports, which must
    still list their columns over an empty table.

    Append the constant degenerate row(s) iff the aggregation INPUT is
    empty, decided by a limit(1) count probe of the input (LocalLimit
    stops each scan task at the first row — O(1) work at any corpus
    size, the x94/x65/x98 limit-probe pattern). On the normal non-empty
    path the function returns ``out`` UNCHANGED — same plan, no union
    branch; the declarative alternative (anti-join against a broadcast
    limit(1) marker) was measured at ~0.35 s of fixed two-stage
    scheduling per key at sf0.1, vs ~0.05 s for this probe job.

    ``row``: one tuple matching out.schema (or a list of tuples for
    multi-row degenerates like the per-column profile)."""
    if inp.limit(1).count() > 0:
        return out
    rows = row if isinstance(row, list) else [row]
    return out.unionByName(out.sparkSession.createDataFrame(rows, out.schema))


def distributed_global_rank(df, order_exprs, out_col: str = "global_rn"):
    """Total-order global row numbering WITHOUT a single-reducer window —
    the s74 two-pass pattern (Spark's zipWithIndex over DataFrames),
    generalized for any frame and sort key (round 8: x76/x121/x128's
    unpartitioned data-grain windows move onto this path).

    Plan: range-exchange on the ordering (RangePartitioner sample pass +
    parallel per-partition sort), one partition-local Arrow numbering
    pass, a partition-count-sized offsets prefix sum (the ONLY
    unpartitioned window, over ~numPartitions rows), broadcast-added
    back. The ordering MUST be total (tie-broken to uniqueness) —
    otherwise RangePartitioner boundary sampling could place equal keys
    on either side of a split and the numbering would be
    run-dependent.

    order_exprs: list of Column expressions (may carry .desc()).
    Output: the input columns plus ``out_col`` (1-based bigint rank).
    """
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import Window  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    spark = df.sparkSession
    n_parts = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *order_exprs).sortWithinPartitions(
        *order_exprs
    )
    out_schema = T.StructType(
        list(ranged.schema.fields)
        + [T.StructField("_pid", T.IntegerType()), T.StructField("_lrn", T.LongType())]
    )

    def number_partition(batches):
        from pyspark import TaskContext  # noqa: PLC0415

        pid = TaskContext.get().partitionId()
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_pid"] = pid
            pdf["_lrn"] = pd.RangeIndex(seen + 1, seen + len(pdf) + 1)
            seen += len(pdf)
            yield pdf

    local = ranged.mapInPandas(number_partition, out_schema).localCheckpoint(
        eager=False
    )  # the counts aggregate AND the final join both read it
    counts = local.groupBy("_pid").agg(F.max("_lrn").alias("_cnt"))
    w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "_pid", F.coalesce(F.sum("_cnt").over(w), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_lrn") + F.col("_off")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def exact_ntile(rank_col: Column, n_col: Column, k: int) -> Column:
    """SQL NTILE(k) computed from a 1-based global rank and the row count
    — exact tile boundaries (the first n%k tiles take ceil(n/k) rows),
    identical to the window function, usable where the rank came from
    distributed_global_rank instead of a single-reducer window."""
    q = (n_col / k).cast("bigint")  # n DIV k (n non-negative, < 2^53)
    r = n_col % k
    big = q + 1  # first r tiles have q+1 rows
    first = ((rank_col - 1) / big).cast("bigint") + 1
    rest = r + ((rank_col - 1 - r * big) / F.greatest(q, F.lit(1))).cast(
        "bigint"
    ) + 1
    return F.when(rank_col <= r * big, first).otherwise(rest).cast("int")


GLOBAL_RANK_LOCAL_LIMIT = 1_000_000  # rows; one sort task handles this fine


def global_rank(df, order_exprs, out_col: str = "global_rn"):
    """Count-gated global numbering (the x94/x65/x98 hybrid contract):
    below GLOBAL_RANK_LOCAL_LIMIT rows a single-partition row_number
    window is the right plan (one task sorting <= 1M short rows beats the
    two-pass machinery's Arrow+checkpoint fixed costs); above it, the s74
    distributed numbering takes over so no task ever sorts the full
    frame. The gate probes limit(N+1).count() — O(N) rows read, never the
    table. Path equivalence is pinned in tests/test_properties.py."""
    from pyspark.sql import Window  # noqa: PLC0415

    if (
        df.limit(GLOBAL_RANK_LOCAL_LIMIT + 1).count()
        <= GLOBAL_RANK_LOCAL_LIMIT
    ):
        w = Window.orderBy(*order_exprs)
        return df.withColumn(out_col, F.row_number().over(w).cast("bigint"))
    return distributed_global_rank(df, order_exprs, out_col)
