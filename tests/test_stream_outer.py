"""s14i streaming LEFT OUTER join semantics: append mode can only emit a
null-padded row once the watermark passes the click's join horizon, so at
availableNow termination the result differs from the batch join by EXACTLY
the unmatched clicks still inside the horizon.  This pins that relationship
instead of hand-waving 'rows-only'."""

import pyspark.sql.functions as F
import pytest

from presto_weather_spark.registry import all_queries
from presto_weather_spark.session import load_table

WATERMARK_S = 2 * 3600  # s14i's watermark delay
JOIN_WINDOW_S = 3600  # purchases within 1 h after the click


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    stream_pdf = (
        all_queries()["s14i_stream_stream_left_outer"]
        .fn(spark, sf_dir)
        .toPandas()
    )
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.col("ts").alias("click_ts"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = c.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "left_outer",
    ).select(
        "click_id",
        "user_id",
        "purchase_id",
        ((F.unix_micros("purchase_ts") - F.unix_micros("click_ts")) / 1_000_000)
        .cast("bigint")
        .alias("gap_seconds"),
        F.unix_micros("click_ts").alias("click_us"),
    )
    # The global watermark is the MIN across both sides' per-side
    # max(event time) - delay (clicks and purchases are separate watermark
    # nodes over the same source).
    side_max = (
        e.filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(F.max(F.unix_micros("ts")).alias("m"))
        .collect()
    )
    max_us = min(r["m"] for r in side_max)
    return stream_pdf, batch.toPandas(), max_us


def _key(pdf):
    return set(
        zip(
            pdf["click_id"],
            pdf["user_id"],
            [None if v != v else int(v) for v in pdf["purchase_id"].astype(float)],
        )
    )


def test_matched_pairs_identical(frames):
    stream_pdf, batch_pdf, _ = frames
    sm = _key(stream_pdf[stream_pdf["purchase_id"].notna()])
    bm = _key(batch_pdf[batch_pdf["purchase_id"].notna()])
    assert sm == bm


def test_null_padded_missing_only_inside_horizon(frames):
    stream_pdf, batch_pdf, max_us = frames
    sn = _key(stream_pdf[stream_pdf["purchase_id"].isna()])
    bn_pdf = batch_pdf[batch_pdf["purchase_id"].isna()]
    bn = _key(bn_pdf)
    # streaming nulls are a subset of batch nulls...
    assert sn <= bn
    # ...and every missing one is a click whose horizon the final watermark
    # (max event time - delay) had not passed: click_ts + window >= watermark.
    missing = bn - sn
    horizon_cutoff_us = max_us - (WATERMARK_S + JOIN_WINDOW_S) * 1_000_000
    by_key = {
        (r.click_id, r.user_id): r.click_us
        for r in bn_pdf.itertuples(index=False)
    }
    for click_id, user_id, _ in missing:
        assert by_key[(click_id, user_id)] >= horizon_cutoff_us
