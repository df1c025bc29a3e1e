"""Two-level staircase decompositions of exact global-order statistics.

The problem: an exact rank / cumulative sum / running max over a total
order is, written naively, ONE window whose partition count does not
grow with the data (``Window.orderBy(...)`` is a single sort partition;
partitioning on a bounded-cardinality key like ``mktsegment`` is the
same thing five times over).  That plan buffers a corpus-sized relation
in O(1) tasks and dies at 100 TB.

The fix (o6's Pareto-skyline pattern, plans/relational.py, generalized
here): pick a BUCKET that is an order-consistent coarsening of the
total order — i.e. the lexicographic order (bucket, local-order) equals
the intended total order.  Then:

- **level 1 (parallel, data-sized):** the window runs WITHIN each
  bucket — partition count proportional to the number of buckets,
  which grows with the data (value-range bands, per-day slices,
  fixed-width key blocks);
- **level 2 (bucket-dim-sized):** one hash aggregate produces a single
  row per bucket (count / sum / max); a window over THAT relation —
  second-level-sized, N/B rows, recursable if ever needed — turns the
  per-bucket totals into strictly-earlier-bucket prefix offsets, which
  join back broadcast.

``global = local  (+|max)  prefix-offset`` is exact, not approximate:
every row's strictly-earlier set is exactly (earlier rows in my bucket)
∪ (all rows of strictly-earlier buckets), by order-consistency of the
bucket.  Same answers, same oracles — only the partitioning changes.

Choosing the bucket column (the patterns used by the call sites):

- near-unique numeric order key → value-range bands, e.g.
  ``floor(16 * log2(v))`` (sub-octave bands: a24/a28 monetary ranks,
  a34's cumulative revenue);
- tie-heavy order key with a unique tiebreak → (key value,
  ``floor(tiebreak / B)``) fixed-width blocks, each bucket ≤ B rows BY
  CONSTRUCTION (a24's recency/frequency ranks);
- event-time order → calendar slices (day buckets: t36's endpoint
  sweep), monotone sequence numbers → fixed-width id blocks (t35's
  arrival frontier).

VERDICT r7 item 1 is the contract these helpers close: "no window whose
partition count is independent of N".
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _local_window(part_cols: list[str], bucket_cols: list[str],
                  local_order: list[Column]) -> Window:
    return (Window.partitionBy(*(part_cols + bucket_cols))
                  .orderBy(*local_order)
                  .rowsBetween(Window.unboundedPreceding, 0))


def _offsets(df: DataFrame, part_cols: list[str], bucket_cols: list[str],
             bucket_order: list[Column], agg: Column,
             combine: str) -> DataFrame:
    """Level 2: one row per bucket via hash agg, then the
    strictly-earlier-bucket prefix over the bucket dim.  The window
    here runs over the SECOND-LEVEL relation (N/B rows — bucket
    counts, not data rows); ``combine`` is ``sum`` or ``max``."""
    per_bucket = (df.groupBy(*(part_cols + bucket_cols))
                    .agg(agg.alias("_bv")))
    w = (Window.partitionBy(*part_cols).orderBy(*bucket_order)
               .rowsBetween(Window.unboundedPreceding, -1))
    prefix = F.sum("_bv") if combine == "sum" else F.max("_bv")
    return per_bucket.select(
        *(part_cols + bucket_cols),
        prefix.over(w).alias("_off"))


def bucketed_row_number(df: DataFrame, part_cols: list[str],
                        bucket_cols: list[str],
                        bucket_order: list[Column],
                        local_order: list[Column],
                        out: str = "rn") -> DataFrame:
    """Exact ``row_number()`` over the total order
    (bucket_order, local_order) within ``part_cols`` — two-level.

    ``bucket_cols`` must already exist on ``df`` and be an
    order-consistent coarsening of the total order; ``bucket_order``
    orders the bucket dim the same way (pass ``F.col(b).desc()`` forms
    for descending orders).  Adds column ``out`` (long)."""
    local = F.row_number().over(
        Window.partitionBy(*(part_cols + bucket_cols))
              .orderBy(*local_order))
    off = _offsets(df, part_cols, bucket_cols, bucket_order,
                   F.count(F.lit(1)), "sum")
    return (df.withColumn("_lrn", local.cast("long"))
              .join(F.broadcast(off), part_cols + bucket_cols)
              .withColumn(out,
                          (F.col("_lrn")
                           + F.coalesce(F.col("_off"), F.lit(0)))
                          .cast("long"))
              .drop("_lrn", "_off"))


def bucketed_cumsum(df: DataFrame, part_cols: list[str],
                    bucket_cols: list[str],
                    bucket_order: list[Column],
                    local_order: list[Column],
                    value: Column, out: str = "cum") -> DataFrame:
    """Exact running ``SUM(value)`` (current row inclusive) over the
    total order — two-level, long-typed (call sites sum exact cents /
    ±1 deltas; BIGINT addition is order-free so the decomposition is
    bit-exact)."""
    local = F.sum(value).over(
        _local_window(part_cols, bucket_cols, local_order))
    off = _offsets(df, part_cols, bucket_cols, bucket_order,
                   F.sum(value), "sum")
    return (df.withColumn("_lc", local.cast("long"))
              .join(F.broadcast(off), part_cols + bucket_cols)
              .withColumn(out,
                          (F.col("_lc")
                           + F.coalesce(F.col("_off"), F.lit(0)))
                          .cast("long"))
              .drop("_lc", "_off"))


def bucketed_running_max(df: DataFrame, part_cols: list[str],
                         bucket_cols: list[str],
                         bucket_order: list[Column],
                         local_order: list[Column],
                         value: Column, out: str = "rmax") -> DataFrame:
    """Exact running ``MAX(value)`` (current row inclusive) over the
    total order — two-level: within-bucket running max, combined with
    the max over strictly-earlier buckets (max is associative and
    monotone, so the split is exact)."""
    local = F.max(value).over(
        _local_window(part_cols, bucket_cols, local_order))
    off = _offsets(df, part_cols, bucket_cols, bucket_order,
                   F.max(value), "max")
    return (df.withColumn("_lm", local)
              .join(F.broadcast(off), part_cols + bucket_cols)
              .withColumn(out, F.greatest("_lm", "_off"))
              .drop("_lm", "_off"))
