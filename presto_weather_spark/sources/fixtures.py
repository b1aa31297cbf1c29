"""Offline Open-Meteo fixture payloads (FIXTURES.md §B2/§B3).

Deterministic stand-ins for the two REST endpoints the reference app calls
(/root/reference/weather.py:42-59 geocoding, :62-85 forecast). No network:
the custom data source replays these.
"""

from __future__ import annotations

# Geocoding candidates keyed by (name, country_code) — shape of weather.py:49
GEOCODE_FIXTURES: dict[tuple[str, str], list[dict]] = {
    ("London", "GB"): [
        {
            "latitude": 51.50853,
            "longitude": -0.12574,
            "name": "London",
            "admin1": "England",
            "country_code": "GB",
        },
        {
            "latitude": 42.98339,
            "longitude": -81.23304,
            "name": "London",
            "admin1": "Ontario",
            "country_code": "CA",
        },
    ],
    ("Sheffield", "GB"): [
        {
            "latitude": 53.38297,
            "longitude": -1.4659,
            "name": "Sheffield",
            "admin1": "England",
            "country_code": "GB",
        }
    ],
    # COALESCE-default exercise: name/admin1 absent (weather.py:57-58)
    ("Nowhere", "GB"): [
        {"latitude": 0.0, "longitude": 0.0, "country_code": "GB"}
    ],
    # empty-results error path (weather.py:50-51)
    ("Atlantis", "GB"): [],
}

# Forecast ticks keyed by (lat, lon) rounded to 2dp — shape of weather.py:72-85
FORECAST_FIXTURES: dict[tuple[float, float], list[dict]] = {
    (51.51, -0.13): [
        {
            "current": {
                "temperature_2m": 14.3,
                "weather_code": 61,
                "time": "2026-08-13T10:30",
            },
            "daily": {"precipitation_probability_max": [72, 40, 10]},
        },
        {
            "current": {
                "temperature_2m": 15.1,
                "weather_code": 3,
                "time": "2026-08-13T10:40",
            },
            "daily": {"precipitation_probability_max": [55, 35, 10]},
        },
        {
            "current": {
                "temperature_2m": 16.0,
                "weather_code": 0,
                "time": "2026-08-13T10:50",
            },
            "daily": {"precipitation_probability_max": [20, 10, 5]},
        },
    ],
    (53.38, -1.47): [
        {
            "current": {
                "temperature_2m": 11.2,
                "weather_code": 75,
                "time": "2026-08-13T10:30",
            },
            "daily": {"precipitation_probability_max": [90, 80, 60]},
        },
        # missing-key variants (NULL propagation, weather.py:75-83)
        {
            "current": {"time": "2026-08-13T10:40"},
            "daily": {"precipitation_probability_max": []},
        },
        {"current": {"temperature_2m": 10.9, "time": "2026-08-13T10:50"}},
    ],
}
