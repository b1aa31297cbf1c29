"""Corpus-statistics operators X82-X84: novelty, fertility, sub-doc dup.

Three training-data diagnostics that complement the dedup (x01-x02*) and
text-analysis (x04-x79) families:

- x82: n-gram NOVELTY attribution — how much genuinely new n-gram mass
  each document adds in ingestion order (the dedup-adjacent measure of
  corpus redundancy growth used to decide when more crawl stops helping).
- x83: tokenizer FERTILITY by language — bytes and BPE-ish tokens per
  whitespace word; the standard multi-lingual tokenizer-budget metric.
- x84: duplicate SPAN mass by source — sub-document dedup at 5-word tile
  granularity (the C4/RefinedWeb paragraph-dedup shape; tiles stand in
  for paragraphs since the fixture text has no paragraph breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from presto_weather_spark.registry import register
from presto_weather_spark.session import load_table


def _words(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


# ---------------------------------------------------------------------------
# X82 — n-gram novelty curve (first-occurrence attribution)
# ---------------------------------------------------------------------------


@register(
    "x82_ngram_novelty",
    oracle="""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
tri AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS tri
  FROM w, UNNEST(generate_series(1, len(ws) - 2)) AS t(i)
),
f AS (SELECT tri, MIN(doc_id) AS first_doc FROM tri GROUP BY tri)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_trigrams,
       CAST(SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END) AS BIGINT)
           AS novel_trigrams,
       round(CAST(SUM(CASE WHEN f.first_doc = t.doc_id THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 6) AS novelty_ratio
FROM tri t JOIN f USING (tri)
GROUP BY t.doc_id
""",
    doc="X82: N-GRAM NOVELTY CURVE — per document (in doc_id ingestion "
    "order): how many of its word trigrams occur for the FIRST time "
    "in the corpus. The declining novelty ratio over ingestion order "
    "is the standard 'is more crawl still adding information' "
    "diagnostic. Plan: one narrow trigram explode (array transform "
    "over the word array, ~n_words rows per doc — not per char), "
    "then first-occurrence via MIN(doc_id) OVER (PARTITION BY "
    "trigram) — a window, NOT a groupBy+self-join, so the trigram "
    "stream is consumed once: exactly two shuffles (trigram, then "
    "doc_id). At 100 TB the trigram exchange hash-partitions "
    "uniformly (no skew: trigram cardinality is near-corpus-sized); "
    "attributing by hash(trigram) instead of the string would cut "
    "exchange bytes ~3x, kept as strings here for oracle exactness.",
)
def x82_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", _words().alias("w")
    )
    tris = (
        d.filter(F.size("w") >= 3)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(w)-3),"
                    " i -> concat_ws(' ', w[i], w[i+1], w[i+2]))"
                )
            ).alias("tri"),
        )
    )
    first_doc = F.min("doc_id").over(Window.partitionBy("tri"))
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
    return (
        tris.withColumn("first_doc", first_doc)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            novel.alias("novel_trigrams"),
            F.round(novel / F.count(F.lit(1)), 6).alias("novelty_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# X83 — tokenizer fertility by language
# ---------------------------------------------------------------------------


@register(
    "x83_tokenizer_fertility",
    oracle="""
WITH per_doc AS (
  SELECT lang,
         strlen(text) AS n_bytes,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
             AS ws_tokens,
         len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]'))
             AS bpe_tokens
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(SUM(ws_tokens) AS BIGINT) AS total_words,
       round(CAST(SUM(bpe_tokens) AS DOUBLE) / SUM(ws_tokens), 6)
           AS fertility,
       round(CAST(SUM(n_bytes) AS DOUBLE) / SUM(bpe_tokens), 6)
           AS bytes_per_token
FROM per_doc
GROUP BY lang
""",
    doc="X83: TOKENIZER FERTILITY — BPE-ish tokens per whitespace word "
    "and bytes per token, by language (same tokenizer conventions as "
    "x10: letter-runs | digit-runs | single punctuation). Fertility "
    "skew across languages is the standard signal that a tokenizer "
    "under-serves a language (each word costing more subwords = "
    "shorter effective context, higher training cost). Plan: pure "
    "map-side per-doc counting folded by one tiny lang-keyed "
    "hash aggregate — integer-exact, one shuffle of ~5 rows.",
)
def x83_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    ws = F.size(
        F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    )
    bpe = F.size(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]"), F.lit(0)
        )
    )
    per_doc = d.select(
        "lang",
        F.octet_length("text").alias("n_bytes"),
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
    )
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bytes").alias("total_bytes"),
        F.sum("ws_tokens").alias("total_words"),
        F.round(F.sum("bpe_tokens") / F.sum("ws_tokens"), 6).alias("fertility"),
        F.round(F.sum("n_bytes") / F.sum("bpe_tokens"), 6).alias(
            "bytes_per_token"
        ),
    )


# ---------------------------------------------------------------------------
# X84 — duplicate span mass by source (sub-document dedup)
# ---------------------------------------------------------------------------


@register(
    "x84_dup_span_mass",
    oracle="""
WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
tiles AS (
  SELECT doc_id, source,
         array_to_string(ws[(5*i + 1):(5*i + 5)], ' ') AS tile
  FROM w, UNNEST(generate_series(0, len(ws) // 5 - 1)) AS t(i)
),
pp AS (
  SELECT tile, doc_id, source, COUNT(*) AS c
  FROM tiles GROUP BY tile, doc_id, source
),
wn AS (SELECT *, COUNT(*) OVER (PARTITION BY tile) AS nd FROM pp)
SELECT source,
       CAST(SUM(c) AS BIGINT) AS total_tiles,
       CAST(SUM(CASE WHEN nd > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_tiles,
       round(CAST(SUM(CASE WHEN nd > 1 THEN c ELSE 0 END) AS DOUBLE)
             / SUM(c), 6) AS dup_mass
FROM wn
GROUP BY source
""",
    doc="X84: DUPLICATE SPAN MASS — sub-document dedup accounting at "
    "5-word tile granularity: per source, what fraction of its text "
    "tiles also appear in at least one OTHER document (the "
    "C4/RefinedWeb paragraph-dedup diagnostic; non-overlapping "
    "stride-5 tiles stand in for paragraphs since fixture text has "
    "no paragraph breaks). Plan mirrors x73's single-consumption "
    "shape: tile explode (n_words/5 rows per doc) -> (tile, doc) "
    "partial count -> COUNT(*) OVER (PARTITION BY tile) gives the "
    "distinct-doc frequency without a groupBy+join-back -> source "
    "rollup. Three shuffles, the tile stream consumed exactly once; "
    "at 100 TB tiles would carry a 64-bit hash instead of the "
    "string (same plan, ~10x narrower exchange).",
)
def x84_dup_span_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", _words().alias("w")
    )
    tiles = (
        d.filter(F.size("w") >= 5)
        .select(
            "doc_id",
            "source",
            F.explode(
                F.expr(
                    "transform(sequence(0, CAST(floor(size(w)/5) AS INT) - 1),"
                    " i -> concat_ws(' ', slice(w, 5*i + 1, 5)))"
                )
            ).alias("tile"),
        )
    )
    pp = tiles.groupBy("tile", "doc_id", "source").agg(
        F.count(F.lit(1)).alias("c")
    )
    nd = F.count(F.lit(1)).over(Window.partitionBy("tile"))
    dup = F.sum(F.when(F.col("nd") > 1, F.col("c")).otherwise(0))
    return (
        pp.withColumn("nd", nd)
        .groupBy("source")
        .agg(
            F.sum("c").alias("total_tiles"),
            dup.alias("dup_tiles"),
            F.round(dup / F.sum("c"), 6).alias("dup_mass"),
        )
    )
