"""R13/R15 parity: the foreachBatch display sink absorbs per-tick errors
(reference /root/reference/weather.py:325-331 — any exception in a tick
renders an error record and the loop continues) and formats readings onto
the 'screen' capture."""

from __future__ import annotations

from presto_weather_spark.streaming.pipeline import run_display_pipeline


def test_display_sink_draws_batches(spark, sf_dir):
    screen = run_display_pipeline(spark, sf_dir)
    assert screen, "no micro-batches reached the display sink"
    assert all(tick["ok"] for tick in screen)
    lines = screen[0]["lines"]
    assert lines and {"user_id", "temp_display", "tick"} <= set(lines[0])


def test_display_sink_absorbs_tick_errors(spark, sf_dir):
    screen = run_display_pipeline(spark, sf_dir, inject_error=True)
    assert screen, "error tick was not rendered"
    assert all(not tick["ok"] for tick in screen)
    assert all(
        line["error"].startswith("Error: ")
        for tick in screen
        for line in tick["lines"]
    ), "error ticks must render the reference's 'Error: {e}' fallback line"
