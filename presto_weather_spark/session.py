"""SparkSession factory and table loading.

Scale notes (100 TB design intent, tested on local[32]):
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  sort-merge -> broadcast demotion replace hand-tuned plans.
- ``spark.sql.shuffle.partitions`` is sized for the local test harness; on a
  real cluster AQE's ``advisoryPartitionSizeInBytes`` governs post-shuffle
  sizing, so the static number only sets the pre-AQE upper bound.
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle (naive-UTC timestamps).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def build_session(app_name: str = "presto_weather_spark", cpus: int | None = None) -> SparkSession:
    """Create (or reuse) the engine's SparkSession with scale-aware defaults."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # A long session compiles one generated class per codegen stage;
        # the JVM's default 240 MB code cache fills after ~50 queries and
        # the JIT silently stops compiling, leaving compute-heavy stages
        # interpreted (~10x). Bigger cache + flushing keeps the JIT alive.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing",
        )
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read as long and convert in load_table (exact
        # integer division — going through double would lose precision).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar parquet scan — Catalyst pushes filters/pruning into it.

    Robust to TIMESTAMP(NANOS) parquet encodings, which Spark's reader
    rejects outright (PARQUET_TYPE_ILLEGAL).  The driver harness hands us a
    vanilla SparkSession, so the nanosAsLong escape hatch must be applied
    here at read time, not only in build_session.  Which columns were nanos
    is sniffed from the parquet footer (metadata-only — O(1) regardless of
    data size, so this holds at 100 TB).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static/removed conf — fall through; read fails loudly if needed
    df = spark.read.parquet(path)
    return _normalize_nanos(df, _nanos_columns(path))


def _nanos_columns(path: str) -> set[str] | None:
    """Column names stored as TIMESTAMP(NANOS) — from the footer only.
    Returns None when the footer could not be inspected (caller falls back
    to a name-based heuristic)."""
    try:
        import pyarrow as pa
        import pyarrow.parquet as pq

        try:
            schema = pq.read_schema(path)
        except Exception:
            schema = pq.ParquetDataset(path).schema
        return {
            f.name
            for f in schema
            if pa.types.is_timestamp(f.type) and f.type.unit == "ns"
        }
    except Exception:
        return None


def _normalize_nanos(df: DataFrame, nanos_cols: set[str] | None) -> DataFrame:
    """TIMESTAMP(NANOS) columns arrive as long under nanosAsLong; truncate
    to microseconds exactly (integer DIV) — matching DuckDB's ns->us cast."""
    from pyspark.sql import functions as F

    for field in df.schema.fields:
        if field.dataType.simpleString() != "bigint":
            continue
        if (nanos_cols is not None and field.name in nanos_cols) or (
            nanos_cols is None and field.name == "ts"
        ):
            df = df.withColumn(
                field.name,
                F.timestamp_micros(F.expr(f"`{field.name}` DIV 1000")),
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for the SQL API path)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
