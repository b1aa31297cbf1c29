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
