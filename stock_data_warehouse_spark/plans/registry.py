"""Query catalog: one named entry per operator from SURVEY.md §2.

Each query registers a PySpark callable ``(spark, sf_dir) -> DataFrame``
and (when SQL-expressible) the DuckDB oracle SQL next to it, so the two
can never drift apart. ``__spark_entry__.queries()`` / ``oracle_sql()``
are thin views over this registry.

Contract (driver): column names must match between the Spark result and
the oracle result — every computed column is aliased identically on both
sides. Results are compared order-insensitively, so queries with LIMIT
must make the selected *set* deterministic (unique-key tiebreakers).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: add a query (and optional DuckDB oracle) to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def query_fns() -> dict[str, QueryFn]:
    _load_all()
    return dict(QUERIES)


def oracle_map() -> dict[str, str]:
    _load_all()
    return dict(ORACLES)


_LOADED = False


#: Every module that registers queries. Imported lazily by name so a
#: module that fails to import (e.g. mid-development) degrades to "its
#: queries are absent" instead of taking the whole catalog down.
_PLAN_MODULES = (
    "relational", "scalar", "windows", "extensions",
    "timeseries", "reference_pipeline", "sampling", "analytics",
    "tpch_shapes",
)

#: Non-plans modules that also register queries (absolute names).
_EXTRA_MODULES = (
    "stock_data_warehouse_spark.streaming.jobs",
    "stock_data_warehouse_spark.sources.sinks",
    "stock_data_warehouse_spark.sources.pydatasource",
)


def _load_all() -> None:
    """Import every query-registering module so side-effects run."""
    global _LOADED
    if _LOADED:
        return
    import importlib
    import sys
    mods = [f"{__package__}.{m}" for m in _PLAN_MODULES]
    mods += list(_EXTRA_MODULES)
    for mod in mods:
        try:
            importlib.import_module(mod)
        except Exception as exc:  # pragma: no cover — dev-time guard
            # Broad on purpose: one broken module must degrade to "its
            # queries are absent", never take down the whole catalog
            # (e.g. a Column built at import time raises AssertionError,
            # not ImportError, when no SparkContext exists yet).
            print(f"[registry] skipping {mod}: {exc!r}", file=sys.stderr)
    _LOADED = True
