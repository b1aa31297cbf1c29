"""Planted-skew stress: measure the bounded-window claims under the exact
condition they exist for (round 8).

The x87b banding and x46 group-limit pre-prune were built for the case the
uniform-fixture rehearsal cannot exhibit: ONE dominant key value owning
most of the corpus. This tool builds a skewed documents table (90% of docs
forced into a single (lang='en', source='web') stratum, text preserved)
at --mult x the sf0.1 row count, then records:

  1. wall time of exact x87 (per-stratum window) vs banded x87b
     (bucket-grain windows) on the same skewed table — plus row-for-row
     equality of their outputs, re-proving losslessness under skew;
  2. the max rows any single window-sort task receives on each path
     (stratum-grain vs bucket-grain group sizes — the quantity that
     decides whether a 100-TB dominant stratum fits in one executor);
  3. x46 wall time on the same table (its WindowGroupLimit pre-prune
     bounds the dominant source's window partition to budget+1 rows).

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


def build_skewed(mult: int, out_dir: str, dominant_frac: float = 0.9) -> str:
    os.makedirs(out_dir, exist_ok=True)
    t = pq.read_table(SRC)
    n = t.num_rows
    ids, texts, langs, sources, nchars = [], [], [], [], []
    text = t["text"].to_pylist()
    lang = t["lang"].to_pylist()
    source = t["source"].to_pylist()
    for k in range(mult):
        for i in range(n):
            gid = k * n + i
            ids.append(gid)
            texts.append(text[i])
            nchars.append(len(text[i]))
            # deterministic 90/10 split on the global id — no RNG needed
            if (gid * 2654435761) % 100 < int(dominant_frac * 100):
                langs.append("en")
                sources.append("web")
            else:
                langs.append(lang[i])
                sources.append(source[i])
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
        os.path.join(out_dir, "documents.parquet"),
    )
    return out_dir


def _time(fn, spark, sf_dir: str, reps: int = 3) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.monotonic()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.monotonic() - t0)
    return best


def main() -> None:
    from pyspark.sql import functions as F

    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=30)
    ap.add_argument("--out", default="/tmp/pws_scale/skew")
    args = ap.parse_args()

    sf_dir = build_skewed(args.mult, args.out)
    spark = build_session("skew_stress")
    q = all_queries()
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
    print(out, flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_REHEARSAL.json",
    )
    merged = json.load(open(path)) if os.path.exists(path) else {}
    merged.setdefault("skew_stress", {})[f"mult{args.mult}_dom90"] = out
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
