"""Recall checks for the approximate-similarity operators against the exact
brute-force baseline (x03). The driver's check for x03b is rows-only (LSH
is approximate by construction), so this is where its quality is pinned.

The synthetic embeddings are near-orthogonal (max pairwise cosine ~0.46 —
no planted neighbor structure), which is the hard case for locality
hashing; the floors below reflect measured behavior on that data
(~0.35-0.45 for both operators), not what clustered real-world embeddings
would give.
"""

from __future__ import annotations

import pytest

from presto_weather_spark.registry import all_queries

RECALL_FLOOR = 0.25

QS = all_queries()


def _pairs(df) -> set[tuple]:
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


@pytest.fixture(scope="module")
def exact(spark, sf_dir):
    return _pairs(QS["x03_cosine_topk"].fn(spark, sf_dir))


@pytest.mark.parametrize(
    "ann_name", ["x03b_lsh_ann_topk", "x03d_ivf_ann_topk", "x03f_pq_ann_topk"]
)
def test_ann_recall_floor(spark, sf_dir, exact, ann_name):
    approx = _pairs(QS[ann_name].fn(spark, sf_dir))
    recall = len(approx & exact) / len(exact)
    assert recall >= RECALL_FLOOR, f"{ann_name} recall {recall:.3f} < {RECALL_FLOOR}"


def test_ann_results_subset_of_corpus_and_ranked(spark, sf_dir):
    rows = QS["x03b_lsh_ann_topk"].fn(spark, sf_dir).collect()
    by_query: dict[int, list] = {}
    for r in rows:
        by_query.setdefault(r["query_id"], []).append(r)
    for query_id, group in by_query.items():
        ranks = sorted(r["nn_rank"] for r in group)
        assert ranks == list(range(1, len(ranks) + 1)), query_id
        sims = [r["cosine_sim"] for r in sorted(group, key=lambda r: r["nn_rank"])]
        assert sims == sorted(sims, reverse=True), query_id


def test_kmeans_partitions_corpus_deterministically(spark, sf_dir):
    from presto_weather_spark.operators.similarity import KMEANS_K

    first = {r["cluster"]: (r["n_members"], r["avg_dist"])
             for r in QS["x15_kmeans_embeddings"].fn(spark, sf_dir).collect()}
    n_vectors = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert sum(n for n, _ in first.values()) == n_vectors  # every vector assigned once
    assert 1 <= len(first) <= KMEANS_K
    assert all(d >= 0 for _, d in first.values())
    second = {r["cluster"]: (r["n_members"], r["avg_dist"])
              for r in QS["x15_kmeans_embeddings"].fn(spark, sf_dir).collect()}
    assert first == second  # centroid rounding makes re-runs bit-stable
