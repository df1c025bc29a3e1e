"""Custom connector via the Spark-4 *Python Data Source* API (OP-S4's
modern engine-native twin).

The reference pulls quotes from an external feed one ticker at a time
(fetch_data.py:136-165). ``sources/external.py`` re-expresses that as a
``mapInPandas`` fan-out; this module is the third form — a first-class
**DataSource** registered with ``spark.dataSource.register`` so the
feed reads like any other table (``spark.read.format("quote_feed")``),
with the engine owning partition planning: each shard of the feed
becomes one ``InputPartition`` read in parallel by Python workers, the
exact surface a production connector (REST-paginated API, message
queue, vendor SDK) plugs into without touching the JVM.

The demo feed is fully deterministic (a closed-form congruence per
(shard, seq)) so the registered query is oracle-EXACT: DuckDB replays
the same closed form over ``range()``. A real transport would replace
``_row`` with an HTTP page fetch per partition — the plumbing
(schema declaration, partition planning, per-partition iterator,
Arrow hand-back) is what this pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition,
)

from ..plans.registry import register

FEED_SCHEMA = ("shard int, seq int, ticker string, price_cents bigint")


def _price_cents(shard: int, seq: int) -> int:
    """Deterministic quote: a fixed congruence both engines can state."""
    return (shard * 1_000_003 + seq * 7_919) % 1_000_000


class QuoteFeedDataSource(DataSource):
    """``format("quote_feed")`` — options: ``shards``, ``rows``."""

    @classmethod
    def name(cls) -> str:
        return "quote_feed"

    def schema(self) -> str:
        return FEED_SCHEMA

    def reader(self, schema) -> "QuoteFeedReader":
        return QuoteFeedReader(
            int(self.options.get("shards", 4)),
            int(self.options.get("rows", 100)))


class QuoteFeedReader(DataSourceReader):
    def __init__(self, shards: int, rows: int):
        self._shards, self._rows = shards, rows

    def partitions(self):
        # one InputPartition per feed shard → the engine schedules one
        # parallel task per shard; at scale `shards` is the feed's own
        # sharding (API page ranges, queue partitions, ...)
        return [InputPartition(s) for s in range(self._shards)]

    def read(self, partition: InputPartition):
        s = partition.value
        for q in range(self._rows):
            yield (s, q, f"TCK{s:02d}{q:04d}", _price_cents(s, q))


def read_quote_feed(spark: SparkSession, shards: int = 4,
                    rows: int = 100) -> DataFrame:
    """Register (idempotently) and read the custom source."""
    spark.dataSource.register(QuoteFeedDataSource)
    return (spark.read.format("quote_feed")
            .option("shards", str(shards))
            .option("rows", str(rows)).load())


@register(
    "s13_python_datasource_feed",
    oracle="""
    WITH sh AS (SELECT UNNEST(range(4))::INT AS shard),
         sq AS (SELECT UNNEST(range(100))::INT AS seq)
    SELECT shard, seq,
           'TCK' || lpad(CAST(shard AS VARCHAR), 2, '0')
                 || lpad(CAST(seq AS VARCHAR), 4, '0') AS ticker,
           CAST((shard * 1000003 + seq * 7919) % 1000000 AS BIGINT)
             AS price_cents,
           CAST((shard * 1000003 + seq * 7919) % 1000000 AS BIGINT)
             / 100.0 AS price
    FROM sh CROSS JOIN sq
    """,
)
def s13_python_datasource_feed(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """OP-S4 (engine-native connector form) — the external quote feed
    as a registered Python Data Source: 4 shards read as 4 parallel
    input partitions, each yielding its deterministic page of quotes,
    then a normal projection on top (price in dollars — integer cents
    / 100.0 is exact-input IEEE division, identical in both engines).
    The oracle replays the closed form over DuckDB ``range()`` — the
    connector's output is value-checked end to end, partition planning
    included (results are set-compared, so the shard→task mapping can
    land anywhere)."""
    from pyspark.sql import functions as F

    feed = read_quote_feed(spark, shards=4, rows=100)
    return feed.select(
        "shard", "seq", "ticker", "price_cents",
        (F.col("price_cents") / F.lit(100.0)).alias("price"))
