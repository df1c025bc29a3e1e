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


def default_value_bucket(v: Column) -> Column:
    """Sign-aware sub-octave value band for a LONG column — monotone in
    ``v`` over the full range (negative values band mirror-image below
    zero), so it is always an order-consistent bucket for a rank/
    quantile decomposition.  Band width is 1/8 octave: single-valued at
    small magnitudes (tie masses like lag 0 resolve with no sort),
    a few percent of a log-uniform corpus at large ones."""
    pos = F.floor(F.log2(v + 1) * 8)
    neg = -F.floor(F.log2(-v + 1) * 8) - 1
    return F.when(v < 0, neg).otherwise(pos).cast("long")


def bucketed_exact_quantiles(df: DataFrame, part_cols: list[str],
                             value: str,
                             probs: list[float]) -> DataFrame:
    """EXACT interpolated quantiles of a LONG column per group —
    ``lo + (hi − lo) · frac`` at rank positions ``(n−1)·p``, the formula
    both Spark's ``percentile()`` and DuckDB's ``quantile_cont`` use —
    WITHOUT the buffering aggregate either engine runs it as (one
    array of every group value in one aggregator).

    Bucketed rank lookup instead: per-(group, value band) counts
    cumulate over the second-level band dim to locate the band holding
    each target rank; SINGLE-valued bands (tie masses) answer directly
    with no sort; multi-valued target bands rank only their own rows
    (one band of one group per task).  Returns one row per group:
    ``part_cols + [q0, q1, ...]`` (double, one per prob, in order).

    Exactness: rank values are exact longs; ``frac`` is the same
    ``(n−1)·p`` double both engines compute; ties make the
    interpolation collapse to the exact value (``lo + Δ·f`` with
    ``Δ = 0``), so there is no two-product cancellation hazard."""
    n_col = F.count(F.lit(1)).alias("_n")
    spec = df.groupBy(*part_cols).agg(n_col) if part_cols \
        else df.agg(n_col)
    for i, p in enumerate(probs):
        pos = (F.col("_n") - 1).cast("double") * F.lit(p)
        r0 = F.floor(pos).cast("long")
        spec = (spec.withColumn(f"_q{i}_r0", r0)
                    .withColumn(f"_q{i}_r1",
                                F.least(r0 + 1, F.col("_n") - 1))
                    .withColumn(f"_q{i}_f", pos - F.floor(pos)))
    rks = F.array(*[F.col(f"_q{i}_r{j}")
                    for i in range(len(probs)) for j in (0, 1)])
    needs = (spec.select(*part_cols, F.explode(rks).alias("_rk"))
                 .distinct())
    b = df.withColumn("_qb", default_value_bucket(F.col(value)))
    bstats = (b.groupBy(*(part_cols + ["_qb"]))
               .agg(F.count(F.lit(1)).alias("_bn"),
                    F.min(value).alias("_bmin"),
                    F.max(value).alias("_bmax")))
    wb = (Window.partitionBy(*part_cols).orderBy("_qb")
                .rowsBetween(Window.unboundedPreceding, -1))
    bcum = bstats.withColumn(
        "_before", F.coalesce(F.sum("_bn").over(wb), F.lit(0)))
    tb = ((needs.join(bcum, part_cols) if part_cols
           else needs.crossJoin(bcum))
          .filter((F.col("_rk") >= F.col("_before"))
                  & (F.col("_rk") < F.col("_before") + F.col("_bn"))))
    direct = (tb.filter(F.col("_bmin") == F.col("_bmax"))
                .select(*part_cols, "_rk",
                        F.col("_bmin").alias("_v")))
    multi = (tb.filter(F.col("_bmin") != F.col("_bmax"))
               .select(*part_cols, "_qb", "_rk",
                       (F.col("_rk") - F.col("_before"))
                       .alias("_lrk")))
    mkeys = part_cols + ["_qb"]
    wl = Window.partitionBy(*mkeys).orderBy(value)
    looked = (b.join(F.broadcast(multi.select(*mkeys).distinct()),
                     mkeys)
               .withColumn("_lrn",
                           F.row_number().over(wl).cast("long") - 1)
               .join(F.broadcast(multi), mkeys)
               .filter(F.col("_lrn") == F.col("_lrk"))
               .select(*part_cols, "_rk", F.col(value).alias("_v")))
    vals = direct.unionByName(looked)
    out = spec
    for i in range(len(probs)):
        v0 = vals.select(*part_cols, F.col("_rk").alias(f"_q{i}_r0"),
                         F.col("_v").alias(f"_q{i}_v0"))
        v1 = vals.select(*part_cols, F.col("_rk").alias(f"_q{i}_r1"),
                         F.col("_v").alias(f"_q{i}_v1"))
        k0, k1 = part_cols + [f"_q{i}_r0"], part_cols + [f"_q{i}_r1"]
        out = (out.join(F.broadcast(v0), k0)
                  .join(F.broadcast(v1), k1))
    qcols = []
    for i in range(len(probs)):
        v0, v1 = F.col(f"_q{i}_v0"), F.col(f"_q{i}_v1")
        qcols.append((v0 + (v1 - v0) * F.col(f"_q{i}_f"))
                     .alias(f"q{i}"))
    return out.select(*part_cols, F.col("_n").alias("n"), *qcols)


def bucketed_lag(df: DataFrame, part_cols: list[str],
                 bucket_cols: list[str], bucket_order: list[Column],
                 local_order: list[Column], value: str,
                 out: str = "prev") -> DataFrame:
    """Exact ``lag(value)`` over the total order — two-level: the
    within-bucket lag covers every row except each bucket's FIRST,
    which takes the LAST value (argmax by local order) of the nearest
    strictly-earlier non-empty bucket.  ``local_order`` must be
    ``value``-correlated only if the caller says so — here the
    boundary fill is the true predecessor because buckets are
    order-consistent: the previous row of a bucket-first row is by
    definition the last row of the previous bucket.

    Implementation note: per-bucket "last value" is one hash agg of
    ``max(struct(local_order…, value))`` (struct argmax — the value
    riding the bucket-maximal local order); the boundary fill is
    ``last(...)`` over the bucket dim ordered by ``bucket_order``
    with an end-at-−1 frame — the frame's last row IS the nearest
    strictly-earlier non-empty bucket, so ``value`` needs no
    monotonicity of any kind."""
    wl = Window.partitionBy(*(part_cols + bucket_cols)) \
               .orderBy(*local_order)
    per_bucket = (df.groupBy(*(part_cols + bucket_cols))
                    .agg(F.max(F.struct(*local_order,
                                        F.col(value).alias("_v")))
                          .alias("_last")))
    wb = (Window.partitionBy(*part_cols).orderBy(*bucket_order)
                .rowsBetween(Window.unboundedPreceding, -1))
    fill = per_bucket.select(
        *(part_cols + bucket_cols),
        F.last("_last").over(wb)["_v"].alias("_fill"))
    return (df.withColumn("_plag", F.lag(value).over(wl))
              .join(F.broadcast(fill), part_cols + bucket_cols)
              .withColumn(out, F.coalesce("_plag", "_fill"))
              .drop("_plag", "_fill"))


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
