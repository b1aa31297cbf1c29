"""Display-formatting expressions (R9-R12 of SURVEY.md §2.1).

Reference semantics reproduced:
  - R9  ``"{:.0f}".format(t)``            (/root/reference/weather.py:268)
  - R10 ``"Chance of rain: {}%".format(p)`` (/root/reference/weather.py:301)
  - R11 ``updated[-5:]`` -> "HH:MM"        (/root/reference/weather.py:306)
  - R12 ``None -> "--"``                   (/root/reference/weather.py:264-265)

All pure Catalyst expressions (format_string/substring/coalesce) — JVM-side,
inside whole-stage codegen; no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def fmt_temperature(t: Column) -> Column:
    """R9+R12: round-to-int string, NULL -> '--'."""
    return F.coalesce(F.format_string("%.0f", F.round(t, 0)), F.lit("--"))


def fmt_rain_line(p: Column) -> Column:
    """R10: 'Chance of rain: {p}%'."""
    return F.format_string("Chance of rain: %d%%", p)


def fmt_updated_hhmm(ts_string: Column) -> Column:
    """R11: suffix-substring HH:MM from an ISO-8601 string."""
    return F.substring(ts_string, -5, 5)


def iso_minute(ts, sep: str = "T") -> Column:
    """Minute-precision ISO rendering built from INTEGER date parts.

    The engine-shared rendering convention (registry.py determinism
    notes; round-8 timestamp_fmt risk burn-down): year/month/day/hour/
    minute extractors have identical cross-engine semantics, while the
    strftime/date_format pattern languages differ in edge behavior
    (era handling, <4-digit years, locale) — exactly the class that
    makes a format-function oracle a latent hash break. printf of the
    integer parts renders bit-identically in both engines by
    construction. Pair with :func:`sql_iso_minute`.
    """
    return F.format_string(
        f"%04d-%02d-%02d{sep}%02d:%02d",
        F.year(ts),
        F.month(ts),
        F.dayofmonth(ts),
        F.hour(ts),
        F.minute(ts),
    )


def sql_iso_minute(ts: str, sep: str = "T") -> str:
    """DuckDB twin of :func:`iso_minute` — same literal, same parts."""
    return (
        f"printf('%04d-%02d-%02d{sep}%02d:%02d', "
        f"year({ts}), month({ts}), day({ts}), hour({ts}), minute({ts}))"
    )


SQL_FMT_TEMPERATURE = "COALESCE(printf('%.0f', round({t}, 0)), '--')"
SQL_FMT_RAIN = "printf('Chance of rain: %d%%', {p})"
SQL_FMT_HHMM = "substring({s}, length({s}) - 4, 5)"
