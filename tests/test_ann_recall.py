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


def test_exact_audit_memo_invalidates_on_corpus_rewrite(spark, sf_dir, tmp_path):
    # The gate's exact-pair memo is keyed by a fingerprint of the
    # embeddings table (part names + sizes + mtimes): rewriting the table
    # IN PLACE must miss the memo and recompute, or a deploy gate would
    # audit a stale dataset version.
    import os
    import time

    from presto_weather_spark.operators import similarity as sim

    out = str(tmp_path / "memo_fixture")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.limit(40).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    first = sim._exact_topk_pairs(spark, out)
    fp1 = sim._embeddings_fingerprint(out)
    assert fp1 in sim._X03_EXACT_MEMO
    time.sleep(0.05)  # ensure a distinct mtime tick for the rewrite
    emb.limit(20).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet")
    )
    fp2 = sim._embeddings_fingerprint(out)
    assert fp2 != fp1  # rewrite changed the fingerprint -> memo miss
    second = sim._exact_topk_pairs(spark, out)
    assert first != second  # recomputed on the new 20-vector corpus


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


def test_exact_audit_skips_memo_when_fingerprint_unavailable(spark, sf_dir, monkeypatch):
    # The OSError->None fingerprint path: an unreadable table listing must
    # compute WITHOUT memoizing (never serve a stale audit set it cannot
    # validate).
    from presto_weather_spark.operators import similarity as sim

    assert sim._embeddings_fingerprint("/nonexistent/sf_dir") is None
    monkeypatch.setattr(sim, "_embeddings_fingerprint", lambda _: None)
    before = dict(sim._X03_EXACT_MEMO)
    pairs = sim._exact_topk_pairs(spark, sf_dir)
    assert len(pairs) > 0
    assert sim._X03_EXACT_MEMO == before  # nothing new memoized


def test_probe_knn_screens_are_bounded_and_consistent(spark, sf_dir):
    # x153/x155 share _probe_knn: per probe at most K neighbors, never the
    # probe itself, and the two screens agree on (query_id, n_neighbors) —
    # the shared-kernel contract that keeps both at one corpus scan.
    from presto_weather_spark.operators.similarity import X15X_K, X15X_N_PROBES

    dist = {r["query_id"]: r for r in QS["x153_knn_distance_outliers"].fn(spark, sf_dir).collect()}
    lab = {r["query_id"]: r for r in QS["x155_knn_label_consistency"].fn(spark, sf_dir).collect()}
    assert set(dist) == set(lab)
    assert all(qid < X15X_N_PROBES for qid in dist)
    for qid, r in dist.items():
        assert 1 <= r["n_neighbors"] <= X15X_K
        assert lab[qid]["n_neighbors"] == r["n_neighbors"]
        assert 0 <= r["mean_knn_dist_e6"] <= 2_000_000
        assert r["dist_flag"] in ("outlier", "ok")
    for r in lab.values():
        assert 0 <= r["n_agree"] <= r["n_neighbors"]
        assert r["label_flag"] == ("suspect" if 3 * r["n_agree"] < r["n_neighbors"] else "ok")


def test_cluster_rep_keeplist_one_keep_per_cluster(spark, sf_dir):
    # x154: exactly one 'keep' per cluster, every clustered doc present
    # once, and the keep maximizes (alpha_e6, -doc_id) within its cluster.
    rows = QS["x154_cluster_rep_keeplist"].fn(spark, sf_dir).collect()
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    assert len({r["doc_id"] for r in rows}) == len(rows)
    for members in by_cluster.values():
        keeps = [r for r in members if r["rep_flag"] == "keep"]
        assert len(keeps) == 1
        best = max(members, key=lambda r: (r["alpha_e6"], -r["doc_id"]))
        assert keeps[0]["doc_id"] == best["doc_id"]
        assert all(r["cluster_size"] == len(members) for r in members)
