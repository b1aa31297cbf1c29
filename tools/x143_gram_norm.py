"""Quantify the fixture-vs-engine split in x143's sf3 scaling (round-8
verdict stretch task).

x143's sf3 alpha of 1.14 was ATTRIBUTED to a fixture birthday effect (the
synth corpus resamples tokens from a fixed vocabulary bag, so within-doc
gram collisions — exactly the duplicated-gram rows x143 aggregates — grow
faster than the corpus). This measures it instead of arguing it: at each
SF, count the gram stream (total work rows) and the duplicated-gram rows
(c >= 2 per (doc, n, gram)), then normalize x143's measured wall time per
million gram rows. If the engine story is right, time-per-gram-row is
~flat across SFs while duplicated-row DENSITY drifts up — the drift is
the fixture's, the flat unit cost is the engine's.

Writes a "x143_gram_normalization" section into SCALE_REHEARSAL.json
(merge-preserving) and prints the table for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from presto_weather_spark.operators.corpus_stats import (  # noqa: E402
    GOPHER_DUP_NS,
    GOPHER_TOP_NS,
    x143_gopher_dup_ngrams,
)
from presto_weather_spark.session import build_session  # noqa: E402

SFS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": "/tmp/pws_scale/sf1",
    "sf3": "/tmp/pws_scale/sf3",
}


def main() -> None:
    from pyspark.sql import functions as F

    spark = build_session("x143_gram_norm")
    ns = GOPHER_TOP_NS + GOPHER_DUP_NS
    out = {}
    for sf, d in SFS.items():
        if not os.path.isdir(d):
            print(f"skip {sf}: {d} missing")
            continue
        docs = spark.read.parquet(os.path.join(d, "documents.parquet"))
        ws = docs.select(
            "doc_id", F.split("text", " ").alias("w")
        ).repartition(spark.sparkContext.defaultParallelism, "doc_id")
        gram_arrays = [
            F.expr(
                f"CASE WHEN size(w) >= {n} THEN "
                f"transform(sequence(1, size(w) - {n - 1}), "
                f"i -> named_struct('n', {n}, 'gram', "
                f"array_join(slice(w, i, {n}), ' '))) "
                f"ELSE array() END"
            )
            for n in ns
        ]
        c = (
            ws.select("doc_id", F.explode(F.concat(*gram_arrays)).alias("s"))
            .groupBy("doc_id", "s.n", "s.gram")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        stats = c.agg(
            F.sum("c").alias("gram_rows"),  # total gram occurrences (work)
            F.count(F.lit(1)).alias("distinct_doc_grams"),
            F.sum(F.when(F.col("c") >= 2, F.col("c"))).alias("dup_gram_rows"),
        ).collect()[0]
        # time x143 itself: warm-up + best of 2 (the rehearsal protocol)
        best = float("inf")
        for _ in range(3):
            t0 = time.monotonic()
            x143_gopher_dup_ngrams(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.monotonic() - t0)
        g = int(stats["gram_rows"])
        dup = int(stats["dup_gram_rows"] or 0)
        out[sf] = {
            "gram_rows": g,
            "dup_gram_rows": dup,
            "dup_density_e6": round(dup * 1_000_000 / g),
            "x143_sec": round(best, 3),
            "sec_per_1e6_gram_rows": round(best * 1_000_000 / g, 4),
        }
        print(sf, out[sf], flush=True)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALE_REHEARSAL.json",
    )
    merged = json.load(open(path)) if os.path.exists(path) else {}
    merged.setdefault("x143_gram_normalization", {}).update(out)
    with open(path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
