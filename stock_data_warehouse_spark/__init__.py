"""stock_data_warehouse_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
repo ``MrDator/stock-data-warehouse`` (a pandas/yfinance ETL pipeline,
surveyed in ``SURVEY.md``) as an idiomatic Spark engine:

- columnar-at-rest (Parquet), explicit ``StructType`` everywhere;
- declarative DataFrame/SQL plans so Catalyst handles pushdown, pruning,
  join strategy and AQE;
- every operator designed for a 1000-executor / 100 TB posture: no
  driver-side ``collect()`` on data paths, broadcast only bounded dims,
  windows partitioned by high-cardinality keys, cross joins gated.

Layout
------
``session``    SparkSession factory (UTC, AQE, Arrow, sane shuffle sizing)
``sources``    scans (parquet/text-list/json) and sinks (per-key JSON,
               manifest, idempotent publish)
``functions``  scalar Column-builder library (the reference's §2.2 kernels)
``operators``  relational/extension operators (alias-resolve, as-of join,
               TTM, dedup, similarity, text analysis, multimodal)
``plans``      the named query catalog wired into ``__spark_entry__``
``streaming``  windowed/stateful streaming (batch-equivalent + readStream)
``pipeline``   the reference pipeline's Spark shape (snapshot build)
"""

__version__ = "0.1.0"
