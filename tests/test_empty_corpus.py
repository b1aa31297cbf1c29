"""Every registered key must survive — AND stay oracle-correct on — the
degenerate corpus sizes n in {0, 1, 2} (round 9 crash sweep, upgraded to
full driver parity in round 10).

A 100-TB pipeline feeds operators empty slices constantly — an empty
language partition, a filter that matches nothing, a fresh ingest hour —
and just-barely-nonempty ones at shard boundaries: a point with no 2nd
neighbor (TwoNN), a PQ training set smaller than the codebook, a
single-source corpus whose "rest" distribution is empty (KS drift).

Round 9 pinned crash-survival only (q.fn(...).count() does not raise) and
that gap let a real divergence through: x94's singleton branch emitted a
(vec_id, NULL, ...) row while its oracle's self-join yields ZERO rows for
a 1-vector corpus (round-9 ADVICE, medium). So this sweep now runs the
EXACT driver comparison (row count + sorted column names + normalized
values, conftest.driver_norm == tools/drive_contract.py:43) against the
DuckDB oracle for every oracle-bearing key at each n; rows-only keys keep
the crash-survival contract.

One test per fixture-size group (not parametrized per key: one Spark
session, one fixture, one DuckDB connection) reporting every violator at
once.
"""

from __future__ import annotations

import os

import duckdb

from conftest import driver_norm

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


def _write_fixture(spark, sf_dir: str, out: str, n: int) -> None:
    for t in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        df.limit(n).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )


def _oracle_con(out: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        # Spark writes a directory per table; glob the part files. An empty
        # write still carries schema (single schema-bearing part file).
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(out, t + '.parquet')}/*.parquet')"
        )
    return con


def _sweep(spark, out: str, n: int, failures: list[str]) -> None:
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    con = _oracle_con(out)
    for name, fn in sorted(qs.items()):
        try:
            sdf = fn(spark, out).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(
                f"n={n} {name}: CRASH {type(e).__name__}: "
                f"{str(e).splitlines()[0][:90]}"
            )
            continue
        if name not in oracles:
            continue  # rows-only contract: crash-survival is the pin
        try:
            ddf = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(
                f"n={n} {name}: ORACLE-CRASH {type(e).__name__}: "
                f"{str(e).splitlines()[0][:90]}"
            )
            continue
        if len(sdf) != len(ddf):
            failures.append(f"n={n} {name}: ROWS {len(sdf)} vs oracle {len(ddf)}")
        elif sorted(sdf.columns) != sorted(ddf.columns):
            failures.append(f"n={n} {name}: SCHEMA {sorted(sdf.columns)} vs {sorted(ddf.columns)}")
        elif driver_norm(sdf) != driver_norm(ddf):
            failures.append(f"n={n} {name}: VALUES diverge ({len(sdf)} rows)")
    con.close()


def test_every_key_survives_an_empty_corpus(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("pws_sf0"))
    _write_fixture(spark, sf_dir, out, 0)
    failures: list[str] = []
    _sweep(spark, out, 0, failures)
    assert not failures, (
        f"{len(failures)} key(s) wrong on an empty corpus:\n" + "\n".join(failures)
    )


def test_every_key_survives_singleton_and_pair_corpora(spark, sf_dir, tmp_path_factory):
    failures: list[str] = []
    for n in (1, 2):
        out = str(tmp_path_factory.mktemp(f"pws_sf_tiny{n}"))
        _write_fixture(spark, sf_dir, out, n)
        _sweep(spark, out, n, failures)
    assert not failures, (
        f"{len(failures)} key(s) wrong on tiny corpora:\n" + "\n".join(failures)
    )
