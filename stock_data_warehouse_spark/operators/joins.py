"""Join operators the reference does as dict lookups — OP-J1/J2/J10.

Scale posture: the alias dimension is tiny (tens of rows) → always
broadcast; the ``row_number`` window partitions by the high-cardinality
group key, so the shuffle is the same one the downstream aggregation
needs (no extra exchange when the partitioning is reused).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resolve_alias(facts: DataFrame, alias_dim: DataFrame,
                  group_cols: list[str], item_col: str,
                  value_col: str,
                  order_col: str | list[str] | None = None,
                  require_positive: bool = False) -> DataFrame:
    """OP-J1/OP-J2 — ordered alias-precedence lookup.

    The reference scans an alias list in order and takes the first line
    item present (``safe_get_row``, fetch_data.py:20-27); the
    balance-sheet variant additionally requires the candidate value to
    be ``> 0`` (fetch_data.py:211-216 — the guard applies *per
    candidate, before precedence*, so a negative first-priority value
    falls through to the next alias).

    Spark shape: broadcast-join facts to
    ``alias_dim(canonical, {item_col}, priority)``, then keep the
    minimum-priority row per ``group_cols + [canonical]`` via
    ``row_number`` — an *ordered* coalesce. Never ``first()`` without a
    sort (nondeterministic under shuffle; SURVEY.md §7 hard-part 2).

    Physical-form note (measured): the tempting one-shot alternative —
    ``min_by(struct(row), struct(priority, tiebreaks))`` as a hash
    aggregation with map-side combine — is 7× SLOWER here despite the
    smaller shuffle: struct-valued min_by falls out of whole-stage
    codegen into interpreted ObjectHashAggregate, while the window sorts
    flat columns inside codegen. The window's shuffle reuses the same
    hash partitioning downstream consumers need, so the extra cost at
    scale is the per-partition sort, which AQE sizes fine.
    """
    joined = facts.join(F.broadcast(alias_dim), on=item_col, how="inner")
    if require_positive:
        joined = joined.filter(F.col(value_col) > 0)
    order = [F.col("priority").asc()]
    if order_col:
        cols = [order_col] if isinstance(order_col, str) else order_col
        order.extend(F.col(c).asc() for c in cols)
    w = Window.partitionBy(*group_cols, "canonical").orderBy(*order)
    return (joined
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "priority"))


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_value_cols: list[str],
              tolerance: Column | None = None) -> DataFrame:
    """OP-J10 — as-of join: for each left row, the most recent right row
    with ``right_ts <= left_ts`` per key.

    Implemented as the union-tag-window pattern (one shuffle on the key,
    no range explosion): tag rows, sort within key by (ts, tag), carry
    the last right value forward with ``last(..., ignorenulls=True)``.
    This scales as a single window over the key partitioning — the
    idiomatic Spark form of a merge as-of join; a broadcast range join
    would blow up on 100 TB facts.

    ``tolerance``: optional max age (Column interval/seconds) — matched
    right rows older than ``left_ts - tolerance`` are nulled out.
    """
    lt = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"), F.struct(*left.columns).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in right_value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    rt = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"), F.lit(None).cast(lt.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(right_ts).alias("__rts"),
    )
    # Right rows sort before left rows at equal ts (__side 0 < 1) so an
    # exactly-simultaneous right row is visible to the left row.
    w = (Window.partitionBy("__k").orderBy("__ts", "__side")
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = lt.unionByName(rt)
    for c in right_value_cols:
        carried = carried.withColumn(
            f"__last_{c}", F.last(f"__r_{c}", ignorenulls=True).over(w))
    carried = carried.withColumn(
        "__last_ts", F.last("__rts", ignorenulls=True).over(w))
    out = carried.filter(F.col("__side") == 1)
    if tolerance is not None:
        age_ok = F.col("__last_ts") >= (F.col("__ts") - tolerance)
        for c in right_value_cols:
            out = out.withColumn(
                f"__last_{c}", F.when(age_ok, F.col(f"__last_{c}")))
        out = out.withColumn("__last_ts", F.when(age_ok, F.col("__last_ts")))
    return out.select(
        "__l.*",
        *[F.col(f"__last_{c}").alias(f"right_{c}") for c in right_value_cols],
        F.col("__last_ts").alias("right_" + right_ts),
    )
