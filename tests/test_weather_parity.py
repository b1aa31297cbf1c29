"""SURVEY §5.3 unit-parity tests: the Spark classification expressions
reproduce the reference's lookup tables bit-for-bit over ALL 19 known WMO
codes plus unknown codes (reference /root/reference/weather.py:92-114
``weather_code_to_text`` and :117-130 ``weather_code_to_icon``)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_weather_spark.functions.weather import (
    ICON_BANDS,
    WEATHER_CODE_TEXT,
    icon_case_expr,
    text_map_expr,
    weather_code_to_icon_py,
    weather_code_to_text_py,
    weather_codes_dim,
)

# Restated verbatim from the reference so a drift in our constants fails
# loudly (weather.py:93-113 / 117-130).
REFERENCE_TEXT = {
    0: "Clear", 1: "Mainly clear", 2: "Partly cloudy", 3: "Overcast",
    45: "Fog", 48: "Rime fog", 51: "Light drizzle", 53: "Drizzle",
    55: "Heavy drizzle", 61: "Light rain", 63: "Rain", 65: "Heavy rain",
    71: "Light snow", 73: "Snow", 75: "Heavy snow", 80: "Rain showers",
    81: "Rain showers", 82: "Violent showers", 95: "Thunderstorm",
}
REFERENCE_ICON = {
    **{c: "sun" for c in (0, 1)},
    **{c: "cloud" for c in (2, 3)},
    **{c: "fog" for c in (45, 48)},
    **{c: "rain" for c in (51, 53, 55, 61, 63, 65, 80, 81, 82)},
    **{c: "snow" for c in (71, 73, 75)},
    95: "storm",
}
UNKNOWN_CODES = [4, 40, 77, 99, 100, -1]
ALL_CODES = sorted(REFERENCE_TEXT) + UNKNOWN_CODES


def test_python_goldens_match_reference_tables():
    assert dict(WEATHER_CODE_TEXT) == REFERENCE_TEXT
    assert {c: i for band, i in ICON_BANDS for c in band} == REFERENCE_ICON
    for code in ALL_CODES:
        assert weather_code_to_text_py(code) == REFERENCE_TEXT.get(
            code, f"Code {code}"
        )
        assert weather_code_to_icon_py(code) == REFERENCE_ICON.get(code, "unknown")


@pytest.fixture(scope="module")
def classified(spark):
    codes = spark.createDataFrame([(c,) for c in ALL_CODES], "code int")
    return {
        r["code"]: (r["description"], r["icon"])
        for r in codes.select(
            "code",
            text_map_expr(F.col("code")).alias("description"),
            icon_case_expr(F.col("code")).alias("icon"),
        ).collect()
    }


def test_spark_expressions_match_reference(classified):
    for code in ALL_CODES:
        desc, icon = classified[code]
        assert desc == REFERENCE_TEXT.get(code, f"Code {code}"), code
        assert icon == REFERENCE_ICON.get(code, "unknown"), code


def test_dim_join_path_matches_reference(spark):
    codes = spark.createDataFrame([(c,) for c in ALL_CODES], "code int")
    dim = weather_codes_dim(spark)
    joined = (
        codes.join(F.broadcast(dim), "code", "left")
        .select(
            "code",
            F.coalesce(
                F.col("description"), F.format_string("Code %d", F.col("code"))
            ).alias("description"),
            F.coalesce(F.col("icon"), F.lit("unknown")).alias("icon"),
        )
    )
    for r in joined.collect():
        assert r["description"] == REFERENCE_TEXT.get(
            r["code"], f"Code {r['code']}"
        )
        assert r["icon"] == REFERENCE_ICON.get(r["code"], "unknown")
