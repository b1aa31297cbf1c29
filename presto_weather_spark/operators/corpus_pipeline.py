"""End-to-end training-corpus curation pipeline (X21) — the composite that
chains the individual X-series stages the way a production data pipeline
would: quality gate -> exact dedup -> near-dup (duplicated-span) gate ->
per-language yield report.

Reference precedent: the reference's whole program is itself a composed
pipeline (fetch -> extract -> classify -> format -> render,
/root/reference/weather.py:324-333); this is the corpus-scale analogue.

Scale design: every stage is a scan-side predicate or a high-cardinality
shuffle (md5 keys, chunk hashes); stages fuse into ~3 shuffles total.
Nothing is collected to the driver; the final report is lang-cardinality
rows. At 100 TB the same plan holds — the chunk-frequency aggregate is the
only stage whose state grows with corpus size, and it shards by hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_weather_spark.operators.dedup import CHUNK_LEN
from presto_weather_spark.registry import register
from presto_weather_spark.session import load_table

MIN_CHARS = 100  # quality gate: minimum document length
MAX_DUP_RATIO = 0.25  # near-dup gate: max duplicated-chunk ratio


@register(
    "x21_corpus_pipeline",
    oracle=f"""
WITH quality AS (
  SELECT doc_id, lang, text
  FROM documents
  WHERE n_chars >= {MIN_CHARS}
),
exact AS (
  SELECT doc_id, lang, text
  FROM (
    SELECT doc_id, lang, text,
           row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality
  ) r WHERE rn = 1
),
ch AS (
  SELECT doc_id, md5(substr(text, CAST(s AS INT), {CHUNK_LEN})) AS h
  FROM exact,
       unnest(generate_series(1, greatest(len(text), 1), {CHUNK_LEN})) AS t(s)
),
freq AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM ch GROUP BY h),
ratio AS (
  SELECT ch.doc_id,
         count(*) FILTER (freq.n_docs > 1) * 1.0 / count(*) AS dup_ratio
  FROM ch JOIN freq USING (h)
  GROUP BY ch.doc_id
),
kept AS (
  SELECT e.doc_id, e.lang, e.text
  FROM exact e JOIN ratio USING (doc_id)
  WHERE ratio.dup_ratio <= {MAX_DUP_RATIO}
)
SELECT d.lang,
       CAST(count(*) AS BIGINT) AS docs_in,
       CAST(count(k.doc_id) AS BIGINT) AS docs_kept,
       round(count(k.doc_id) * 1.0 / count(*), 4) AS keep_rate,
       CAST(coalesce(SUM(len(string_split_regex(trim(k.text), '\\s+'))), 0)
            AS BIGINT) AS tokens_kept
FROM documents d LEFT JOIN kept k USING (doc_id)
GROUP BY d.lang
""",
    doc="X21: composite corpus-curation pipeline — length-based quality "
    "gate, deterministic exact dedup (md5 + windowed survivor), "
    "duplicated-span gate (X19's chunk profile as a filter), then a "
    "per-language yield report (docs in/kept, keep rate, surviving "
    "tokens). The judged composite proving the X-series stages compose "
    "into one Catalyst plan.",
)
def x21_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(spark.sparkContext.defaultParallelism, "doc_id")

    quality = d.filter(F.col("n_chars") >= MIN_CHARS).select("doc_id", "lang", "text")

    w = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    exact = (
        quality.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        # exact feeds both the chunk profile and the final keep-join;
        # checkpoint so the dedup window runs once
        .localCheckpoint(eager=False)
    )

    starts = F.sequence(F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHUNK_LEN))
    ch = exact.select("doc_id", "text", F.explode(starts).alias("s")).select(
        "doc_id", F.md5(F.col("text").substr(F.col("s"), F.lit(CHUNK_LEN))).alias("h")
    ).localCheckpoint(eager=False)  # chunk table feeds freq + join-back (x18 pattern)
    freq = ch.groupBy("h").agg(F.countDistinct("doc_id").alias("n_docs"))
    dup = F.when(F.col("n_docs") > 1, 1).otherwise(0)
    ratio = (
        ch.join(freq, "h")
        .groupBy("doc_id")
        .agg((F.sum(dup) / F.count(F.lit(1))).alias("dup_ratio"))
    )
    kept = (
        exact.join(ratio, "doc_id")
        .filter(F.col("dup_ratio") <= MAX_DUP_RATIO)
        .select("doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"))
    )

    return (
        d.join(kept, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("docs_in"),
            F.count("n_tokens").alias("docs_kept"),
            F.round(F.count("n_tokens") / F.count(F.lit(1)), 4).alias("keep_rate"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("tokens_kept"),
        )
    )


# ---------------------------------------------------------------------------
# X60 — curation pipeline v2 (round-3 stages fused into one plan)
# ---------------------------------------------------------------------------

V2_MIN_CHARS = 50
V2_CELL_CAP = 10
V2_TOKEN_BUDGET = 600


@register(
    "x60_curation_pipeline_v2",
    oracle=f"""
WITH base AS (
  SELECT doc_id, source, lang, n_chars, text,
         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                              t -> t <> '')) AS BIGINT) AS n_tok
  FROM documents
),
quality AS (SELECT * FROM base WHERE n_chars >= {V2_MIN_CHARS}),
dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
    FROM quality
  ) WHERE rn = 1
),
capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY lang, source
      ORDER BY md5('cap:' || CAST(doc_id AS VARCHAR)), doc_id) AS cap_rk
    FROM dedup
  ) WHERE cap_rk <= {V2_CELL_CAP}
),
budgeted AS (
  SELECT * FROM (
    SELECT *, SUM(n_tok) OVER (
      PARTITION BY source
      ORDER BY md5('budget:' || CAST(doc_id AS VARCHAR)), doc_id
      ROWS UNBOUNDED PRECEDING) AS cum_tok
    FROM capped
  ) WHERE cum_tok <= {V2_TOKEN_BUDGET}
)
SELECT b.source,
       CAST(COUNT(*) AS BIGINT) AS n_input,
       CAST(SUM(CASE WHEN q.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_quality,
       CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dedup,
       CAST(SUM(CASE WHEN c.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_capped,
       CAST(SUM(CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_budgeted
FROM base b
LEFT JOIN quality q ON q.doc_id = b.doc_id
LEFT JOIN dedup d ON d.doc_id = b.doc_id
LEFT JOIN capped c ON c.doc_id = b.doc_id
LEFT JOIN budgeted g ON g.doc_id = b.doc_id
GROUP BY b.source
""",
    doc="X60: CURATION PIPELINE v2 — the round-3 stages composed into one "
    "fused plan with per-stage yield accounting: quality gate "
    "(min-chars) -> exact dedup (md5 keep-lowest, x34's survivor rule "
    "simplified) -> per-cell doc cap (x57) -> per-source token budget "
    "(x46), reported as a per-source funnel (n_input -> n_quality -> "
    "n_dedup -> n_capped -> n_budgeted). The yield report is how a "
    "curation run is actually reviewed — which stage costs which "
    "source how much — and the funnel monotonicity is asserted in "
    "tests/test_properties.py. Plan: stages chain window/agg steps "
    "that all key on source-derived partitions; Catalyst fuses the "
    "projections, and the accounting joins ship doc_ids only. "
    "Companion to x21 (round-1 pipeline: quality/dup-span/lang "
    "yield).",
)
def x60_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    )
    base = docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        "text",
        F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != ""))
        .cast("bigint")
        .alias("n_tok"),
    )
    quality = base.filter(F.col("n_chars") >= V2_MIN_CHARS)
    w_dup = Window.partitionBy(F.md5("text")).orderBy("doc_id")
    dedup = (
        quality.withColumn("rn", F.row_number().over(w_dup))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    w_cap = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.concat_ws(":", F.lit("cap"), F.col("doc_id"))), "doc_id"
    )
    capped = (
        dedup.withColumn("cap_rk", F.row_number().over(w_cap))
        .filter(F.col("cap_rk") <= V2_CELL_CAP)
        .drop("cap_rk")
    )
    w_budget = (
        Window.partitionBy("source")
        .orderBy(F.md5(F.concat_ws(":", F.lit("budget"), F.col("doc_id"))), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    budgeted = capped.withColumn("cum_tok", F.sum("n_tok").over(w_budget)).filter(
        F.col("cum_tok") <= V2_TOKEN_BUDGET
    )

    def stage_flag(stage_df: DataFrame, name: str) -> DataFrame:
        return stage_df.select("doc_id").withColumn(name, F.lit(1))

    report = (
        base.select("doc_id", "source")
        .join(stage_flag(quality, "q"), "doc_id", "left")
        .join(stage_flag(dedup, "d"), "doc_id", "left")
        .join(stage_flag(capped, "c"), "doc_id", "left")
        .join(stage_flag(budgeted, "g"), "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_input"),
            F.sum(F.coalesce(F.col("q"), F.lit(0))).alias("n_quality"),
            F.sum(F.coalesce(F.col("d"), F.lit(0))).alias("n_dedup"),
            F.sum(F.coalesce(F.col("c"), F.lit(0))).alias("n_capped"),
            F.sum(F.coalesce(F.col("g"), F.lit(0))).alias("n_budgeted"),
        )
    )
    return report
