"""Live-mode transport of the open_meteo source (reference weather.py:31-39).

The live path is unit-tested with a fake transport (no network in CI): the
status-check must fail fast on non-200 exactly like the reference's
http_get_json, and a 200 payload must flow through the same row-shaping
code the replay path uses — including NOT re-applying the temperature-unit
conversion the API already performed URL-side (weather.py:69-70).
"""

import json

import pytest

from presto_weather_spark.sources import open_meteo as om


@pytest.fixture
def transport(monkeypatch):
    """Install a fake transport; yields a dict the test mutates."""
    state = {"status": 200, "body": b"{}", "urls": []}

    def fake(url):
        state["urls"].append(url)
        return state["status"], state["body"]

    monkeypatch.setattr(om, "_TRANSPORT", fake)
    return state


def test_live_geocode_parses_results(transport):
    transport["body"] = json.dumps(
        {
            "results": [
                {
                    "latitude": 51.50853,
                    "longitude": -0.12574,
                    "name": "London",
                    "admin1": "England",
                    "country_code": "GB",
                }
            ]
        }
    ).encode()
    rows = om._geocode_rows(
        {"mode": "live", "name": "London", "country_code": "GB", "count": "1"}
    )
    assert rows == [(51.50853, -0.12574, "London", "England", "GB")]
    # URL mirrors the reference's construction (weather.py:42-46)
    (url,) = transport["urls"]
    assert url.startswith("https://geocoding-api.open-meteo.com/v1/search?")
    assert "name=London" in url and "country=GB" in url and "count=1" in url


def test_live_non_200_fails_fast(transport):
    transport["status"] = 503
    transport["body"] = b"Service Unavailable"
    with pytest.raises(RuntimeError, match="HTTP 503"):
        om._geocode_rows({"mode": "live", "name": "London"})
    with pytest.raises(RuntimeError, match="HTTP 503"):
        om._forecast_rows({"mode": "live"})


def test_live_forecast_no_double_unit_conversion(transport):
    # The API already converted (temperature_unit rode the URL); the client
    # must pass the value through untouched even when fahrenheit was asked.
    transport["body"] = json.dumps(
        {
            "current": {
                "temperature_2m": 57.7,
                "weather_code": 3,
                "time": "2026-08-14T09:00",
            },
            "daily": {"precipitation_probability_max": [40]},
        }
    ).encode()
    rows = om._forecast_rows(
        {
            "mode": "live",
            "latitude": "51.51",
            "longitude": "-0.13",
            "temperature_unit": "fahrenheit",
        }
    )
    assert rows == [(57.7, 3, "2026-08-14T09:00", 40)]
    (url,) = transport["urls"]
    assert "temperature_unit=fahrenheit" in url
    assert url.startswith("https://api.open-meteo.com/v1/forecast?")


def test_live_forecast_guarded_array_head(transport):
    # Missing daily block → rain_prob None (guarded head, weather.py:79-83).
    transport["body"] = json.dumps(
        {"current": {"temperature_2m": 14.0, "weather_code": 0, "time": "t"}}
    ).encode()
    rows = om._forecast_rows({"mode": "live"})
    assert rows == [(14.0, 0, "t", None)]


def test_replay_mode_never_calls_transport(transport):
    om._geocode_rows({"name": "London", "country_code": "GB", "count": "1"})
    om._forecast_rows({"latitude": "51.51", "longitude": "-0.13"})
    assert transport["urls"] == []
