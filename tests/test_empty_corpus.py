"""Every registered key must survive a schema-correct EMPTY corpus (round 9).

A 100-TB pipeline feeds operators empty slices constantly — an empty
language partition, a filter that matches nothing, a fresh ingest hour.
Before this sweep, 28 of 322 keys crashed on driver-local model paths
(np.stack of zero rows, float(None) corpus scalars, 1/0 renormalizers)
or empty-write parquet round-trips (no part files -> schema inference
failure). The contract pinned here: empty in -> either an EMPTY result or
a meaningful degenerate (zero counters, NULL stats) — never an exception.

One test loops all keys (not parametrized: one Spark session, one empty
fixture, sub-5-minute wall) and reports every violator at once.
"""

from __future__ import annotations

import os

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def test_every_key_survives_an_empty_corpus(spark, sf_dir, tmp_path_factory):
    from presto_weather_spark.registry import all_queries

    out = str(tmp_path_factory.mktemp("pws_sf0"))
    for t in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        df.limit(0).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )

    failures: list[str] = []
    for name, q in sorted(all_queries().items()):
        try:
            q.fn(spark, out).count()
        except Exception as e:  # noqa: BLE001
            failures.append(f"{name}: {type(e).__name__}: {str(e).splitlines()[0][:90]}")
    assert not failures, (
        f"{len(failures)} key(s) crash on an empty corpus:\n" + "\n".join(failures)
    )


def test_every_key_survives_singleton_and_pair_corpora(spark, sf_dir, tmp_path_factory):
    # n=1 and n=2 are the degenerate sizes BETWEEN empty and normal: a
    # point with no 2nd neighbor (TwoNN), a PQ training set smaller than
    # the codebook, a single-source corpus whose "rest" distribution is
    # empty (KS drift) — each caught a real crash in round 9. Empty-in is
    # covered above; these pin the just-barely-nonempty contract.
    from presto_weather_spark.registry import all_queries

    failures: list[str] = []
    for n in (1, 2):
        out = str(tmp_path_factory.mktemp(f"pws_sf_tiny{n}"))
        for t in TABLES:
            df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
            df.limit(n).coalesce(1).write.mode("overwrite").parquet(
                os.path.join(out, f"{t}.parquet")
            )
        for name, q in sorted(all_queries().items()):
            try:
                q.fn(spark, out).count()
            except Exception as e:  # noqa: BLE001
                failures.append(
                    f"n={n} {name}: {type(e).__name__}: "
                    f"{str(e).splitlines()[0][:90]}"
                )
    assert not failures, (
        f"{len(failures)} key(s) crash on tiny corpora:\n" + "\n".join(failures)
    )
