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
    DataSource, DataSourceReader, DataSourceStreamReader, InputPartition,
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

    def streamReader(self, schema) -> "QuoteFeedStreamReader":
        return QuoteFeedStreamReader(
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


class QuoteFeedStreamReader(DataSourceStreamReader):
    """The same feed as a MICRO-BATCHED stream: the offset is the
    feed page cursor (one page = one shard-worth of ``rows``), exactly
    how a production paged-API / queue connector tracks progress —
    ``initialOffset``/``latestOffset`` bound each micro-batch,
    ``partitions(start, end)`` plans one task per page in the range,
    and Spark checkpoints the committed offset for exactly-once
    replay. Bounded here (latestOffset = shards) so an AvailableNow
    run drains the feed deterministically."""

    def __init__(self, shards: int, rows: int):
        self._shards, self._rows = shards, rows

    def initialOffset(self):
        return {"page": 0}

    def latestOffset(self):
        return {"page": self._shards}

    def partitions(self, start, end):
        return [InputPartition(p)
                for p in range(start["page"], end["page"])]

    def read(self, partition: InputPartition):
        s = partition.value
        for q in range(self._rows):
            yield (s, q, f"TCK{s:02d}{q:04d}", _price_cents(s, q))

    def commit(self, end):
        pass


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


@register(
    "s14_python_stream_feed",
    oracle="""
    WITH sh AS (SELECT UNNEST(range(4))::INT AS shard),
         sq AS (SELECT UNNEST(range(100))::INT AS seq),
    feed AS (
      SELECT shard, seq,
             CAST((shard * 1000003 + seq * 7919) % 1000000 AS BIGINT)
               AS price_cents
      FROM sh CROSS JOIN sq
    )
    SELECT shard,
           COUNT(*) AS n_quotes,
           CAST(SUM(price_cents) AS BIGINT) AS sum_cents,
           MIN(price_cents) AS min_cents,
           MAX(price_cents) AS max_cents
    FROM feed GROUP BY shard
    """,
)
def s14_python_stream_feed(spark: SparkSession,
                           sf_dir: str) -> DataFrame:
    """OP-S4/T1 composed — the quote feed consumed as a STREAM through
    the Python Data Source streaming reader: page-cursor offsets,
    per-page partition planning, checkpointed commits — the custom
    streaming connector surface (queue/paged-API ingestion) next to
    the file-source forms. The bounded run drains every page in one
    AvailableNow pass and aggregates per shard; integer-cents sums
    keep the aggregation engine-exact, so the whole connector + stream
    + aggregate path is value-checked against the closed-form DuckDB
    replay."""
    from pyspark.sql import functions as F

    spark.dataSource.register(QuoteFeedDataSource)
    s = (spark.readStream.format("quote_feed")
         .option("shards", "4").option("rows", "100").load())
    agg = (s.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n_quotes"),
                 F.sum("price_cents").alias("sum_cents"),
                 F.min("price_cents").alias("min_cents"),
                 F.max("price_cents").alias("max_cents")))
    from ..streaming.jobs import _run_to_table
    snap = _run_to_table(agg, "complete")
    return snap.select("shard", "n_quotes", "sum_cents",
                       "min_cents", "max_cents")
