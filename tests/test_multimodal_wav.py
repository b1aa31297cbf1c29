"""The one REAL media decode path: PCM16 WAV via the stdlib `wave` codec.

x05e's oracle hash-verifies the size algebra; these tests pin what SQL
cannot reach — amplitude correctness, byte-exactness of the header, and
the genuine decode-failure modes (truncated header, wrong magic) that the
stubbed image/video paths cannot exercise.
"""

from __future__ import annotations

import uuid

import wave

import pytest

from presto_weather_spark.operators.multimodal import (
    WAV_SAMPLE_RATE,
    decode_wav,
    encode_wav,
)


def test_wav_roundtrip_known_amplitude():
    # 'ab' -> bytes 97, 98 -> samples (97-128)*256=-7936, (98-128)*256=-7680
    payload = encode_wav("ab")
    assert len(payload) == 44 + 2 * 2
    rate, n, mean_abs = decode_wav(payload)
    assert (rate, n) == (WAV_SAMPLE_RATE, 2)
    assert mean_abs == (7936 + 7680) / 2


def test_wav_header_is_canonical_riff():
    payload = encode_wav("x")
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    assert payload[12:16] == b"fmt " and payload[36:40] == b"data"
    # chunk sizes: RIFF size = total - 8; data size = 2 bytes
    assert int.from_bytes(payload[4:8], "little") == len(payload) - 8
    assert int.from_bytes(payload[40:44], "little") == 2


def test_wav_empty_and_multibyte_text():
    rate, n, mean_abs = decode_wav(encode_wav(""))
    assert (n, mean_abs) == (0, 0.0)
    # non-ASCII: samples follow utf-8 BYTES, not code points
    rate, n, _ = decode_wav(encode_wav("é"))
    assert n == len("é".encode("utf-8")) == 2
    rate, n, _ = decode_wav(encode_wav(None))
    assert n == 0


def test_wav_decode_failure_modes():
    payload = encode_wav("hello world")
    # truncated mid-header: the codec must refuse, not fabricate
    with pytest.raises((wave.Error, EOFError)):
        decode_wav(payload[:20])
    # wrong magic
    with pytest.raises(wave.Error):
        decode_wav(b"NOTAWAV!" + payload[8:])
    # empty payload
    with pytest.raises((wave.Error, EOFError)):
        decode_wav(b"")


def test_x05e_query_matches_size_algebra(spark):
    from presto_weather_spark.operators.multimodal import x05e_wav_decode
    from presto_weather_spark.session import load_table

    sf_dir = "/root/testdata/sf0.001"
    out = {r["doc_id"]: r for r in x05e_wav_decode(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    assert len(out) == len(docs)
    for r in docs:
        n_bytes_text = len((r["text"] or "").encode("utf-8"))
        got = out[r["doc_id"]]
        assert got["n_samples"] == n_bytes_text
        assert got["n_bytes"] == 44 + 2 * n_bytes_text
        assert got["sample_rate"] == WAV_SAMPLE_RATE


def test_loudness_screen_gates_planted_amplitudes(spark):
    # x05f on planted clips: a low-byte-spread doc (letters only, |s| <=
    # ~8k) gates 'quiet'; a doc with spaces (|s| = 24576 spikes) raises
    # RMS past the 8000 gate -> 'ok'; gain is peak-referenced.
    from presto_weather_spark.registry import all_queries
    import os
    import tempfile

    rows = [
        (1, "mmmmmmmm", "en", "s", 8),           # |s| = (109-128)*256 -> 4864
        (2, "a b c d e f g h", "en", "s", 15),   # spaces spike to 24576
    ]
    out = os.path.join(tempfile.gettempdir(), f"pws_prop_loudness_{uuid.uuid4().hex}")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    res = {
        r["doc_id"]: r
        for r in all_queries()["x05f_audio_loudness_screen"].fn(spark, out).collect()
    }
    assert res[1]["loudness_gate"] == "quiet" and res[1]["peak"] == 4864
    assert res[1]["rms"] == 4864.0  # constant signal: rms == peak
    assert res[2]["loudness_gate"] == "ok" and res[2]["peak"] == 24576
