"""Empirical scale rehearsal — measure, don't argue, the 100-TB story.

Runs the heaviest X-series keys at sf0.1 and at a synthesized sf1
(tools/synth_scale.py, 10x rows) and records the per-key scaling
exponent alpha = log(t_sf1 / t_sf0.1) / log(10): alpha ~ 1 is linear,
alpha < 1 means fixed costs still dominate, alpha > 1 is super-linear
and gets a named follow-up in SCALE.md.

Usage:
    python tools/synth_scale.py                 # once, builds /tmp/pws_scale/sf1
    python tools/scale_rehearsal.py [keys...]   # default: the 15 heaviest

Timing protocol: per key per SF, best of REPS=2 fresh action runs in one
warm session (the BASELINE.md convention); the first key's first run is
preceded by a session+Arrow warm-up query so cold-start JVM/Python-worker
costs don't land on it.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from presto_weather_spark.registry import all_queries  # noqa: E402
from presto_weather_spark.session import build_session  # noqa: E402

SF01 = "/root/testdata/sf0.1"
SF1 = os.environ.get("PWS_SF1_DIR", "/tmp/pws_scale/sf1")
REPS = 2

DEFAULT_KEYS = [
    "x45_naive_bayes_lang",
    "x128_rrf_hybrid_retrieval",
    "x150_dsir_hash_fidelity",
    "x143_gopher_dup_ngrams",
    "x104_dup_span_excision",
    "x102_dup_span_extraction",
    "x89_bm25_topk",
    "x110_dup_graph_triangles",
    "x115_dedup_threshold_sensitivity",
    "x96_editdist_verified_pairs",
    "x92_textrank_keywords",
    "x93_doremi_reweighting",
    "x54_skipgram_pairs",
    "x51_bpe_tokenize",
    "x39_bigram_logprob",
]


def _time(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.monotonic()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    keys = sys.argv[1:] or DEFAULT_KEYS
    if not os.path.isdir(SF1):
        raise SystemExit(f"{SF1} missing — run tools/synth_scale.py first")
    spark = build_session("scale_rehearsal")
    q = all_queries()
    # warm up JVM + Python workers + both fixture scans
    spark.read.parquet(os.path.join(SF01, "documents.parquet")).count()
    spark.read.parquet(os.path.join(SF1, "documents.parquet")).count()

    out = {}
    for k in keys:
        t_small = _time(q[k].fn, spark, SF01)
        t_big = _time(q[k].fn, spark, SF1)
        alpha = math.log(t_big / t_small) / math.log(10)
        out[k] = {
            "sf0.1_sec": round(t_small, 3),
            "sf1_sec": round(t_big, 3),
            "alpha": round(alpha, 3),
        }
        print(
            f"{k}: {t_small:.2f}s -> {t_big:.2f}s  alpha={alpha:+.2f}",
            flush=True,
        )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_REHEARSAL.json",
    )
    # merge-preserving: later runs add keys; the sf3 section survives
    merged: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            merged = json.load(f)
    # setdefault handles all three cases (fresh file, section present,
    # file with only note/sf3 sections) without mis-nesting foreign
    # sections under the two-point dict.
    merged.setdefault("two_point_sf0.1_to_sf1", {}).update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"wrote {path}")
    print("\n| key | sf0.1 s | sf1 s | alpha |")
    print("|---|---|---|---|")
    for k, v in out.items():
        print(f"| {k} | {v['sf0.1_sec']} | {v['sf1_sec']} | {v['alpha']} |")


if __name__ == "__main__":
    main()
