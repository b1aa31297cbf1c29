"""Planted-duplicate golden tests for the hash-based dedup operators whose
driver check is rows-only (no shared hash function with DuckDB): MinHash+LSH
(x02) and SimHash (x02c).  These prove the *semantics* — near-identical texts
pair up, unrelated texts don't — independent of the hash values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from presto_weather_spark.operators.dedup import (
    minhash_near_dup_pairs,
    minhash_signatures,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain falls on "
    "the quiet village and the river runs past the old stone mill"
)
NEAR = BASE.replace("quiet village", "quiet hamlet")  # one-token edit
FAR = (
    "completely different subject matter entirely about spacecraft "
    "navigation systems and orbital mechanics with no shared phrasing at all"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR)], ["doc_id", "text"]
    )


def test_minhash_signature_shape_and_determinism(spark, docs):
    rows = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert set(rows) == {1, 2, 3}
    assert all(len(sig) == 16 for sig in rows.values())
    rows2 = {r["doc_id"]: r["sig"] for r in minhash_signatures(docs).collect()}
    assert rows == rows2
    # identical inputs -> identical signatures; near-identical -> mostly equal
    overlap_near = sum(a == b for a, b in zip(rows[1], rows[2]))
    overlap_far = sum(a == b for a, b in zip(rows[1], rows[3]))
    assert overlap_near >= 8, f"near-dup overlap too low: {overlap_near}/16"
    assert overlap_far <= 2, f"unrelated overlap too high: {overlap_far}/16"


def test_minhash_finds_planted_pair_only(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_near_dup_pairs(docs).collect()
    }
    assert (1, 2) in pairs, "planted near-duplicate pair not found"
    assert pairs[(1, 2)] >= 0.5
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_exact_duplicate_full_overlap(spark):
    docs = spark.createDataFrame([(1, BASE), (2, BASE)], ["doc_id", "text"])
    [(a, b, j)] = [
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in minhash_near_dup_pairs(docs).collect()
    ]
    assert (a, b, j) == (1, 2, 1.0)
