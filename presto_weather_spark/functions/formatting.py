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


SQL_FMT_TEMPERATURE = "COALESCE(printf('%.0f', round({t}, 0)), '--')"
SQL_FMT_RAIN = "printf('Chance of rain: %d%%', {p})"
SQL_FMT_HHMM = "substring({s}, length({s}) - 4, 5)"
