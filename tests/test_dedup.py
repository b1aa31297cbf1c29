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


# ---------------------------------------------------------------------------
# Connected-components algorithms on synthetic multi-node graphs.
#
# The fixture corpus yields ZERO x02b Jaccard pairs at every scale factor,
# so through the registry both CC algorithms only ever see the edgeless
# early-return and x81 only size-1 clusters. These tests drive the actual
# loop bodies — min-label propagation rounds and large-star/small-star
# contraction rounds — on graphs with paths, triangles, and singletons,
# and cross-check the two algorithms against each other and against the
# known components.
# ---------------------------------------------------------------------------


def _cc_case(spark, edges, n_nodes):
    nodes = spark.createDataFrame([(i,) for i in range(n_nodes)], ["doc_id"])
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    return nodes, pairs


def _expected(n_nodes, components):
    out = {i: i for i in range(n_nodes)}
    for comp in components:
        m = min(comp)
        for v in comp:
            out[v] = m
    return out


CC_GRAPHS = [
    # path 0-1-2-3-4 plus singletons: propagation needs multiple rounds
    ([(0, 1), (1, 2), (2, 3), (3, 4)], 7, [{0, 1, 2, 3, 4}]),
    # triangle + disjoint pair, edges given in arbitrary orientation
    ([(5, 3), (3, 4), (4, 5), (9, 8)], 10, [{3, 4, 5}, {8, 9}]),
    # 12-node chain: stresses the star-contraction log-round collapse
    ([(i, i + 1) for i in range(11)], 12, [set(range(12))]),
    # two components that share no labels, joined out of order
    ([(7, 2), (2, 11), (6, 1), (1, 13)], 14, [{2, 7, 11}, {1, 6, 13}]),
    # 25-node chain, diameter 24: exceeds the old fixed 20-round cap that
    # silently returned unconverged labels (round-4 ADVICE) — min-label
    # must now run to convergence, star-contraction still finishes in
    # O(log n) rounds
    ([(i, i + 1) for i in range(24)], 25, [set(range(25))]),
]


@pytest.mark.parametrize("edges,n,comps", CC_GRAPHS)
def test_min_label_clusters_multi_node(spark, edges, n, comps):
    from presto_weather_spark.operators.dedup import min_label_clusters

    nodes, pairs = _cc_case(spark, edges, n)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in min_label_clusters(nodes, pairs).collect()
    }
    assert got == _expected(n, comps)


@pytest.mark.parametrize("edges,n,comps", CC_GRAPHS)
def test_star_contraction_clusters_multi_node(spark, edges, n, comps):
    from presto_weather_spark.operators.dedup import star_contraction_clusters

    nodes, pairs = _cc_case(spark, edges, n)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in star_contraction_clusters(nodes, pairs).collect()
    }
    assert got == _expected(n, comps)


def test_cc_algorithms_agree_on_random_graph(spark):
    # Deterministic pseudo-random graph (md5-driven, no RNG state): 40
    # nodes, ~35 edges — multiple non-trivial components virtually
    # guaranteed. The two algorithms must produce identical labelings.
    import hashlib

    from presto_weather_spark.operators.dedup import (
        min_label_clusters,
        star_contraction_clusters,
    )

    n = 40
    edges = []
    for k in range(35):
        h = hashlib.md5(f"edge-{k}".encode()).hexdigest()
        a, b = int(h[:8], 16) % n, int(h[8:16], 16) % n
        if a != b:
            edges.append((a, b))
    nodes, pairs = _cc_case(spark, edges, n)
    lab1 = {
        r["doc_id"]: r["cluster_id"]
        for r in min_label_clusters(nodes, pairs).collect()
    }
    lab2 = {
        r["doc_id"]: r["cluster_id"]
        for r in star_contraction_clusters(nodes, pairs).collect()
    }
    assert lab1 == lab2
    # sanity: the graph is non-trivial (some component has >= 3 members)
    from collections import Counter

    assert max(Counter(lab1.values()).values()) >= 3


def test_soft_dedup_weights_multi_member_clusters(spark):
    # x81's weight rule on clusters with real multiplicity: weights are
    # 1/cluster_size and sum to exactly the number of distinct clusters.
    from pyspark.sql import Window

    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5)],
        ["doc_id", "cluster_id"],
    )
    w = Window.partitionBy("cluster_id")
    out = clusters.select(
        "doc_id",
        "cluster_id",
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    ).select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        F.expr("CAST(1000000 DIV cluster_size AS BIGINT)").alias(
            "sample_weight_e6"
        ),
    ).collect()
    sizes = {r["doc_id"]: r["cluster_size"] for r in out}
    assert sizes == {0: 3, 1: 3, 2: 3, 3: 2, 4: 2, 5: 1}
    # 3*333333 + 2*500000 + 1000000 — truncation loses 1 unit in the
    # size-3 cluster; total stays within one unit per cluster of 3e6
    total = sum(r["sample_weight_e6"] for r in out)
    assert total == 2_999_999


# ---------------------------------------------------------------------------
# x73b — vectorized gear-hash CDC: kernel identities and the resync invariant
# ---------------------------------------------------------------------------


def _pseudo_text(n, seed="gear-text"):
    """Deterministic ASCII pseudo-random text (md5 stream, no RNG state)."""
    import hashlib

    out = []
    k = 0
    while sum(len(s) for s in out) < n:
        h = hashlib.md5(f"{seed}-{k}".encode()).hexdigest()
        out.append(h)
        k += 1
    return "".join(out)[:n]


def test_gear_doubling_equals_sequential_recurrence():
    """The 6-pass doubling convolution must equal the naive per-byte gear
    recurrence h_i = (h_{i-1} << 1) + GEAR[b_i] (mod 2^64) at EVERY
    position — the identity that makes the vectorized kernel safe."""
    import numpy as np

    from presto_weather_spark.operators.dedup import (
        _gear_table,
        gear_hash_vectorized,
    )

    raw = np.frombuffer(_pseudo_text(1000).encode(), dtype=np.uint8)
    got = gear_hash_vectorized(raw)
    gear = _gear_table()
    h = 0
    want = []
    for b in raw.tolist():
        h = ((h << 1) + int(gear[b])) & 0xFFFFFFFFFFFFFFFF
        want.append(h)
    assert got.tolist() == want


def test_gear_boundaries_resynchronize_after_insertion():
    """The CDC invariant: inserting one character shifts only the chunks
    around the edit point — boundaries strictly past the 64-byte window
    re-align, so the tail chunk hashes are identical (what x19's fixed
    grid cannot do)."""
    import hashlib

    from presto_weather_spark.operators.dedup import _gear_chunk_rows

    text = _pseudo_text(5000)
    edited = text[:1000] + "!" + text[1000:]
    _, ha, _ = _gear_chunk_rows(1, text, hashlib.md5)
    _, hb, _ = _gear_chunk_rows(1, edited, hashlib.md5)
    # common prefix: chunks entirely before the edit are untouched
    pref = 0
    while pref < min(len(ha), len(hb)) and ha[pref] == hb[pref]:
        pref += 1
    # common suffix: chunks past the edit + one window resynchronize
    suf = 0
    while (
        suf < min(len(ha), len(hb)) - pref and ha[-1 - suf] == hb[-1 - suf]
    ):
        suf += 1
    assert pref > 0, "prefix chunks before the edit must be stable"
    # ~4000 tail bytes at ~32 B/chunk => ~125 chunks; generous slack
    assert suf >= 50, f"tail failed to resync: only {suf} common suffix chunks"
    # the disturbed middle is local to the edit
    assert len(ha) - pref - suf <= 4, (pref, suf, len(ha), len(hb))


def test_gear_cdc_query_runs_and_accounts_every_doc(spark):
    """x73b at sf0.001: one output row per document, chunk lengths sum
    back to the document byte length (no byte lost to chunking)."""
    from presto_weather_spark.operators.dedup import x73b_gear_cdc_chunking
    from presto_weather_spark.session import load_table

    import hashlib

    from presto_weather_spark.operators.dedup import _gear_chunk_rows

    sf_dir = "/root/testdata/sf0.001"
    out = x73b_gear_cdc_chunking(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == len(docs)
    assert all(r["n_chunks"] >= 1 for r in rows.values())
    assert all(0.0 <= r["dup_ratio"] <= 1.0 for r in rows.values())
    # byte conservation: kernel chunk lengths sum back to the document
    # byte length for every doc (no byte lost or double-counted at a
    # boundary), and the query's avg_chunk_len agrees with the kernel
    for d in docs:
        n_bytes = len((d["text"] or "").encode("utf-8"))
        _, _, lens = _gear_chunk_rows(d["doc_id"], d["text"], hashlib.md5)
        assert sum(lens) == n_bytes, (d["doc_id"], sum(lens), n_bytes)
        got = rows[d["doc_id"]]
        assert got["n_chunks"] == len(lens)
        assert abs(got["avg_chunk_len"] - round(sum(lens) / len(lens), 4)) < 1e-9


def _write_docs(spark, rows, name):
    import os
    import tempfile

    import uuid

    out = os.path.join(tempfile.gettempdir(), f"{name}_{uuid.uuid4().hex}")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def test_editdist_verify_planted_neardup_and_nonclone(spark):
    # x96 on a planted corpus: a near-identical pair (one word edited)
    # must pass blocking AND verify as is_dup; a pair sharing grams but
    # with a long divergent tail must surface as a candidate yet FAIL the
    # 0.8 similarity verdict — the whole point of the verify stage.
    from presto_weather_spark.registry import all_queries

    core = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    near = core.replace("epsilon", "EPSILON", 1)
    tail = core + "completely divergent suffix " * 12
    rows = [
        (1, core, "en", "s0", len(core)),
        (2, near, "en", "s1", len(near)),
        (3, tail, "en", "s0", len(tail)),
        (4, "unrelated words entirely about other topics and things", "en", "s1", 55),
    ]
    out = _write_docs(spark, rows, "pws_prop_editdist")
    res = {
        (r["doc_a"], r["doc_b"]): r
        for r in all_queries()["x96_editdist_verified_pairs"].fn(spark, out).collect()
    }
    assert (1, 2) in res and res[(1, 2)]["is_dup"], res
    assert res[(1, 2)]["lev_dist"] == 7  # epsilon -> EPSILON: 7 char edits
    assert (1, 3) in res and not res[(1, 3)]["is_dup"], res
    assert not any(4 in k for k in res), res


def test_dup_span_extraction_planted_coordinates(spark):
    # x102 on a planted corpus: two docs share an exact 12-token run at
    # known positions -> exactly one span per doc with the exact
    # (start, end) coordinates; a doc with < 8 tokens yields no row.
    from presto_weather_spark.registry import all_queries

    shared = "one two three four five six seven eight nine ten eleven twelve"
    a = "preA1 preA2 " + shared + " postA1 postA2"
    b = "preB1 preB2 preB3 " + shared
    rows = [
        (1, a, "en", "s0", len(a)),
        (2, b, "en", "s1", len(b)),
        (3, "tiny doc under eight", "en", "s0", 20),
    ]
    out = _write_docs(spark, rows, "pws_prop_dupspan")
    res = {}
    for r in all_queries()["x102_dup_span_extraction"].fn(spark, out).collect():
        res.setdefault(r["doc_id"], []).append(r)
    # doc 1: shared run occupies token positions 3..14 -> windows 3..7
    assert len(res[1]) == 1
    s1 = res[1][0]
    assert (s1["span_start"], s1["span_end"]) == (3, 14)
    assert s1["span_tokens"] == 12 and s1["n_dup_windows"] == 5
    # doc 2: shared run at positions 4..15 -> windows 4..8
    assert len(res[2]) == 1
    s2 = res[2][0]
    assert (s2["span_start"], s2["span_end"]) == (4, 15)
    assert 3 not in res


def test_dup_span_excision_planted(spark):
    # x104 on the x102 planted corpus: the shared 12-token run is excised
    # from BOTH owners (the aggressive variant), surrounding context
    # survives verbatim, the tiny doc is untouched, and a doc that IS one
    # big duplicated span survives as an empty row (tokens_removed = all).
    from presto_weather_spark.registry import all_queries

    shared = "one two three four five six seven eight nine ten eleven twelve"
    rows = [
        (1, "prea1 prea2 " + shared + " posta1 posta2", "en", "s0", 1),
        (2, "preb1 preb2 preb3 " + shared, "en", "s1", 1),
        (3, "tiny doc under eight", "en", "s0", 1),
        (4, shared, "en", "s1", 1),
    ]
    out = _write_docs(spark, rows, "pws_prop_excision")
    res = {
        r["doc_id"]: r
        for r in all_queries()["x104_dup_span_excision"].fn(spark, out).collect()
    }
    assert res[1]["clean_text"] == "prea1 prea2 posta1 posta2"
    assert res[1]["tokens_removed"] == 12
    assert res[2]["clean_text"] == "preb1 preb2 preb3"
    assert res[3]["clean_text"] == "tiny doc under eight"
    assert res[3]["tokens_removed"] == 0
    assert res[4]["clean_text"] == "" and res[4]["tokens_removed"] == 12
    assert res[4]["n_tokens"] == 12
