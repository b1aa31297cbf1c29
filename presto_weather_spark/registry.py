"""Query registry — the single source of truth for the judged contract.

Every implemented operator from SURVEY.md §2 registers here with:
  - ``name``:   stable key (R/S/X-series id + slug)
  - ``fn``:     (spark, sf_dir) -> DataFrame  (the Spark-first implementation)
  - ``oracle``: equivalent ANSI SQL for the DuckDB oracle, or ``None`` for
                genuinely non-SQL-expressible ops (driver then records a
                weaker rows-only check).

``__spark_entry__.py`` derives ``queries()`` / ``oracle_sql()`` from this
registry; the pytest oracle harness (tests/test_oracle.py) runs the same
comparison the driver runs, at sf0.001, so the correctness gate is the
development loop.

Determinism conventions (see SURVEY.md §7.0):
  - alias every computed column identically on both sides;
  - money-style double sums go through DECIMAL(18,2) inside the SUM and are
    cast back to double — decimal addition is exact and associative, so the
    result is identical regardless of Spark's partial-aggregation order;
  - avg/ratio outputs are rounded to a fixed scale on both sides;
  - DuckDB integer sums are cast to BIGINT (DuckDB widens to HUGEINT);
  - timestamps leave the engine as formatted strings or DATEs.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return wrap


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in all_queries().values()}


def oracle_sql() -> dict[str, str]:
    return {q.name: q.oracle for q in all_queries().values() if q.oracle is not None}


_LOADED = False
_DEFERRED: list[Callable[[], None]] = []


def defer_install(fn: Callable[[], None]) -> None:
    """Queue a composed-oracle installer to run after ALL operator modules
    are imported — for oracles composed from a key registered in a module
    that loads later (the import-order-safe variant of the x133 pattern)."""
    _DEFERRED.append(fn)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from presto_weather_spark.operators import (  # noqa: F401
        corpus_pipeline,
        corpus_stats,
        dedup,
        multimodal,
        parity_extras,
        relational,
        scalar_functions,
        similarity,
        text_analysis,
        tpch_extra,
    )
    from presto_weather_spark import flagship  # noqa: F401
    from presto_weather_spark.functions import weather  # noqa: F401
    from presto_weather_spark.sources import open_meteo  # noqa: F401
    from presto_weather_spark.streaming import pipeline  # noqa: F401

    for fn in _DEFERRED:
        fn()
    _DEFERRED.clear()
    _LOADED = True
