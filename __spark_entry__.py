"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``stock_data_warehouse_spark.plans`` — one named
entry per operator from SURVEY.md §2, registered next to its oracle so
the two cannot drift apart. This module is a thin view over that
registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Per-market-segment revenue rollup (SURVEY.md §7 M1): the Spark
    shape of the reference's per-sector TTM aggregation — star join +
    pushed date predicate + hash aggregation.
    """
    from stock_data_warehouse_spark.plans.relational import (
        flagship_segment_revenue,
    )
    return flagship_segment_revenue(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from stock_data_warehouse_spark.plans.registry import query_fns
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query; keys missing here (relative to
    ``queries()``) are the declared non-SQL-expressible operators and
    get the driver's weaker rows-only check.
    """
    from stock_data_warehouse_spark.plans.registry import oracle_map
    return oracle_map()
