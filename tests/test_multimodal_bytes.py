"""Byte-exact multimodal oracles, proven on non-ASCII text.

Round-7's x05f/x05g/x146 oracles walked text per CHARACTER and relied on a
fixture-is-ASCII pin; round 8 rebuilt them on the utf-8 byte stream
(hex(encode(text)) octets). This plants a corpus where char and byte
streams genuinely diverge — accents (2 bytes), CJK (3), emoji (4), and an
ASCII control — and asserts the full driver comparison (rows + sorted
columns + order-insensitive stringified values) between the Spark kernels
(which always operated on bytes) and the rewritten oracles.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from presto_weather_spark.registry import all_queries

DOCS = [
    (1, "héllo wörld", "en", "web"),          # 2-byte latin accents
    (2, "中文文本解码测试", "zh", "books"),      # 3-byte CJK
    (3, "emoji 🎉🎊 payload", "en", "social"),  # 4-byte astral plane
    (4, "plain ascii text only", "en", "web"),
    (5, "mixed: café + 東京 + 🚀", "fr", "web"),
    (6, "", "en", "web"),                      # empty text edge
]


@pytest.fixture(scope="module")
def nonascii_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nonascii_sf")
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in DOCS], pa.int64()),
            "text": pa.array([r[1] for r in DOCS], pa.string()),
            "lang": pa.array([r[2] for r in DOCS], pa.string()),
            "source": pa.array([r[3] for r in DOCS], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in DOCS], pa.int64()),
        }
    )
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _norm(df):
    df = df[sorted(df.columns)]

    def nv(v):
        if v is None:
            return None
        if isinstance(v, float):
            return "NaN" if math.isnan(v) else repr(v + 0.0)
        return str(v)

    return sorted(tuple(nv(v) for v in r) for r in df.itertuples(index=False, name=None))


@pytest.mark.parametrize(
    "key",
    ["x05e_wav_decode", "x05f_audio_loudness_screen", "x05g_png_decode",
     "x146_audio_voiced_spans"],
)
def test_byte_oracles_match_on_nonascii_text(spark, nonascii_dir, key):
    q = all_queries()[key]
    assert q.oracle is not None
    sdf = q.fn(spark, nonascii_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{nonascii_dir}/documents.parquet')"
    )
    ddf = con.execute(q.oracle).fetchdf()
    assert len(sdf) == len(ddf), (key, len(sdf), len(ddf))
    assert sorted(sdf.columns) == sorted(ddf.columns), key
    assert _norm(sdf) == _norm(ddf), key
    # the planted corpus must actually exercise the divergence: at least
    # one doc where byte count != char count
    n_bytes = con.execute(
        "SELECT sum(octet_length(encode(text)) - length(text)) FROM documents"
    ).fetchone()[0]
    assert n_bytes > 0
