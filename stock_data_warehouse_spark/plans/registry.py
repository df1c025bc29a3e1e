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


def _load_all() -> None:
    """Import every plan module so registration side-effects run."""
    global _LOADED
    if _LOADED:
        return
    from . import relational  # noqa: F401
    from . import scalar  # noqa: F401
    from . import windows  # noqa: F401
    from . import extensions  # noqa: F401
    from . import timeseries  # noqa: F401
    from . import reference_pipeline  # noqa: F401
    _LOADED = True
