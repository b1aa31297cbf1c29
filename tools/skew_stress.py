"""Planted-skew stress: measure the bounded-window claims under the exact
condition they exist for (round 8; grid widened in round 9).

The x87b banding and x46 group-limit pre-prune were built for the case the
uniform-fixture rehearsal cannot exhibit: ONE dominant key value owning
most of the corpus. This tool builds skewed documents tables (text
preserved, strata forced) at --mult x the sf0.1 row count under THREE
scenarios:

  * ``dom90``  — 90% of docs in a single (en, web) stratum;
  * ``dom99``  — 99% in that stratum (a near-total single-source crawl);
  * ``monolang`` — EVERY doc in one stratum (degenerate skew: banding is
    the only thing standing between the window and the whole corpus),
    plus ~1% planted ZERO-TOKEN docs so x46's empty-doc side path (the
    budget-bounded zero-token resolution join) executes under skew, and
    an x106b-vs-x106 cut-point comparison so the sketch banding is
    re-proven where all mass lands in one language's quantile sketch.

Per scenario it records:

  1. wall time of exact x87 (per-stratum window) vs banded x87b
     (bucket-grain windows) on the same skewed table — plus row-for-row
     equality of their outputs, re-proving losslessness under skew;
  2. the max rows any single window-sort task receives on each path
     (stratum-grain vs bucket-grain group sizes — the quantity that
     decides whether a 100-TB dominant stratum fits in one executor);
  3. x46 wall time (its WindowGroupLimit pre-prune bounds the dominant
     source's window partition to budget+1 rows).

Writes a "skew_stress" section into SCALE_REHEARSAL.json
(merge-preserving) and prints the table for SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from presto_weather_spark.registry import all_queries  # noqa: E402
from presto_weather_spark.session import build_session  # noqa: E402

SRC = "/root/testdata/sf0.1/documents.parquet"

SCENARIOS = {
    # name -> (dominant_frac, plant_zero_token_frac)
    "dom90": (0.90, 0.0),
    "dom99": (0.99, 0.0),
    "monolang": (1.0, 0.01),
}


def build_skewed(
    mult: int,
    out_dir: str,
    dominant_frac: float = 0.9,
    zero_token_frac: float = 0.0,
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(SRC)
    n = t.num_rows
    ids, texts, langs, sources, nchars = [], [], [], [], []
    text = t["text"].to_pylist()
    lang = t["lang"].to_pylist()
    source = t["source"].to_pylist()
    zero_mod = int(1 / zero_token_frac) if zero_token_frac else 0
    for k in range(mult):
        for i in range(n):
            gid = k * n + i
            ids.append(gid)
            # planted zero-token docs (x46's empty-doc side path):
            # whitespace-only text tokenizes to [], n_chars stays honest
            if zero_mod and (gid * 2654435761) % zero_mod == 0:
                texts.append("   ")
                nchars.append(3)
            else:
                texts.append(text[i])
                nchars.append(len(text[i]))
            # deterministic split on the global id — no RNG needed
            if (gid * 2654435761) % 100 < int(dominant_frac * 100):
                langs.append("en")
                sources.append("web")
            else:
                langs.append(lang[i])
                sources.append(source[i])
    dst = os.path.join(out_dir, "documents.parquet")
    if os.path.islink(dst) or os.path.exists(dst):
        os.unlink(dst)  # never follow a stale symlink (synth_scale lesson)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(langs, pa.string()),
                "source": pa.array(sources, pa.string()),
                "n_chars": pa.array(nchars, pa.int64()),
            }
        ),
        dst,
    )
    return out_dir


def _time(fn, spark, sf_dir: str, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def run_scenario(spark, q, sf_dir: str, check_x106b: bool) -> dict:
    from pyspark.sql import functions as F

    d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    d.count()  # warm scan

    # window-task input sizes: the stratum-grain path hands its largest
    # sort task the whole dominant stratum; the bucket-grain path hands it
    # a 4096th of it
    strat = (
        d.groupBy("lang", "source").count().agg(F.max("count")).collect()[0][0]
    )
    bucket = (
        d.select(
            "lang",
            "source",
            F.substring(
                F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
                1,
                3,
            ).alias("b"),
        )
        .groupBy("lang", "source", "b")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )

    t_exact = _time(q["x87_stratified_sample"].fn, spark, sf_dir)
    t_banded = _time(q["x87b_stratified_sample_banded"].fn, spark, sf_dir)
    t_budget = _time(q["x46_token_budget_cap"].fn, spark, sf_dir)

    # losslessness under skew: banded output == exact output, row for row
    exact_rows = sorted(
        map(tuple, q["x87_stratified_sample"].fn(spark, sf_dir).collect())
    )
    banded_rows = sorted(
        map(tuple, q["x87b_stratified_sample_banded"].fn(spark, sf_dir).collect())
    )
    assert exact_rows == banded_rows, "banded output diverged under skew"

    out = {
        "n_docs": d.count(),
        "dominant_stratum_rows": int(strat),
        "max_window_task_rows_exact_x87": int(strat),
        "max_window_task_rows_banded_x87b": int(bucket),
        "window_task_reduction": round(strat / max(bucket, 1), 1),
        "x87_exact_sec": round(t_exact, 3),
        "x87b_banded_sec": round(t_banded, 3),
        "x46_sec": round(t_budget, 3),
        "outputs_identical": True,
    }

    if check_x106b:
        # x106b sketch cut points vs x106 exact NTILE where ALL mass sits
        # in one language's sketch. percentile_approx(accuracy=10000)
        # guarantees rank error <= n/accuracy per cut; a bucket is bounded
        # by two cuts, so per-(lang, bucket) counts may shift by at most
        # 2 * n_lang / accuracy docs (450 per cut at 4.5M monolang docs —
        # the fixture-scale "<= 1 doc" figure does NOT transfer here, the
        # error is proportional, which is exactly what this scenario
        # measures).
        exact = {
            (r["lang"], r["ppl_bucket"]): r["n_docs"]
            for r in q["x106_ccnet_perplexity_buckets"].fn(spark, sf_dir).collect()
        }
        banded = {
            (r["lang"], r["ppl_bucket"]): r["n_docs"]
            for r in q["x106b_ccnet_buckets_banded"].fn(spark, sf_dir).collect()
        }
        assert set(exact) == set(banded)
        from pyspark.sql import functions as _F

        d2 = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        n_lang_max = (
            d2.groupBy("lang").count().agg(_F.max("count")).collect()[0][0]
        )
        # The real error model under replication skew: a cut can move by
        # the sketch's rank error (n/accuracy per cut) AND, because bucket
        # membership is a VALUE comparison, every doc TIED at the moved
        # cut's 6dp score flips together — the mult-x replication plants
        # mult-sized tie groups by construction, so deviation quantizes to
        # tie-group boundaries. Bound: 2 cuts x (rank error + max tie).
        score = (
            q["x20_unigram_logprob"].fn(spark, sf_dir)
            .join(d2.select("doc_id", "lang"), "doc_id")
        )
        max_tie = (
            score.groupBy("lang", "avg_logprob")
            .count()
            .agg(_F.max("count"))
            .collect()[0][0]
        )
        sketch_bound = 2 * (n_lang_max // 10000 + int(max_tie)) + 1
        dev = max(abs(exact[k] - banded[k]) for k in exact)
        assert dev <= sketch_bound, (
            f"x106b cut-point deviation {dev} exceeds the sketch+tie bound "
            f"{sketch_bound} under monolang skew"
        )
        assert sum(exact.values()) == sum(banded.values())
        out["x106b_max_bucket_count_dev_vs_exact"] = int(dev)
        out["x106b_max_score_tie_group"] = int(max_tie)
        out["x106b_sketch_plus_tie_bound"] = int(sketch_bound)
        # x46's zero-token docs actually flowed through the side path
        zero_docs = d.filter(
            F.size(F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != ""))
            == 0
        ).count()
        out["zero_token_docs_planted"] = int(zero_docs)
        assert zero_docs > 0, "monolang scenario must plant zero-token docs"

    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=30)
    ap.add_argument("--out", default="/tmp/pws_scale/skew")
    ap.add_argument(
        "--scenarios", nargs="*", default=list(SCENARIOS), choices=list(SCENARIOS)
    )
    args = ap.parse_args()

    spark = build_session("skew_stress")
    q = all_queries()
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_REHEARSAL.json",
    )

    for name in args.scenarios:
        frac, zfrac = SCENARIOS[name]
        sf_dir = build_skewed(
            args.mult, f"{args.out}_{name}", dominant_frac=frac,
            zero_token_frac=zfrac,
        )
        out = run_scenario(spark, q, sf_dir, check_x106b=(name == "monolang"))
        print(name, out, flush=True)

        merged = json.load(open(path)) if os.path.exists(path) else {}
        key = f"mult{args.mult}_dom90" if name == "dom90" else (
            f"mult{args.mult}_{name}"
        )
        merged.setdefault("skew_stress", {})[key] = out
        with open(path, "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
