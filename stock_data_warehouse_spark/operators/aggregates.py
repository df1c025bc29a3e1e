"""Aggregation operators — OP-A1/A2/A3 (SURVEY.md §2.4).

The reference's implicit-column-order idioms (``iloc[:4]``,
``iloc[:, 0]``, ``.iloc[-1]``) become explicit windows: deterministic
under shuffle, partitioned by the high-cardinality key so the window
shuffle doubles as the aggregation shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ttm_top_k_sum(df: DataFrame, group_cols: list[str], ts_col: str,
                  value_col: str, k: int = 4,
                  tiebreak_col: str | None = None,
                  out_col: str = "ttm") -> DataFrame:
    """OP-A1 — per group: sum of the k most-recent values, nulls as 0.

    Reference: ``row.iloc[:4].fillna(0).sum()`` (fetch_data.py:35-36) —
    "most recent 4 quarters" by source column order, re-expressed as an
    explicit ``row_number`` window. Empty groups yield no row here;
    callers materialize 0 via an outer join + ``coalesce`` (the
    reference returns 0 for missing line items, fetch_data.py:32-33).
    """
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .groupBy(*group_cols)
            .agg(F.sum(F.coalesce(F.col(value_col), F.lit(0.0)))
                 .alias(out_col)))


def latest_row(df: DataFrame, group_cols: list[str], ts_col: str,
               tiebreak_col: str | None = None) -> DataFrame:
    """OP-A2 — most recent row per group (``iloc[:, 0]``,
    fetch_data.py:198), deterministic via tiebreaker.
    """
    order = [F.col(ts_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def last_non_null(df: DataFrame, group_cols: list[str], ts_col: str,
                  value_col: str, tiebreak_col: str | None = None,
                  out_col: str = "last_value") -> DataFrame:
    """OP-A3 — last non-null value per group in time order
    (``close_series.dropna().iloc[-1]``, fetch_data.py:156-160).
    Groups that are entirely null yield a null (the reference's
    price-not-found skip is the caller's filter).

    One aggregation, one shuffle: ``max_by(value, ord)`` where ``ord``
    is the (ts, tiebreak) struct nulled for null values — max_by skips
    null orderings, so the survivor is the time-max non-null value and
    all-null groups produce a NULL (not zero rows). Struct comparison is
    field-by-field, so the tiebreak resolves equal timestamps
    deterministically (SURVEY.md §7 hard-part 4).
    """
    ord_fields = [F.col(ts_col)]
    if tiebreak_col:
        ord_fields.append(F.col(tiebreak_col))
    ord_col = F.when(F.col(value_col).isNotNull(), F.struct(*ord_fields))
    return (df.groupBy(*group_cols)
            .agg(F.max_by(F.col(value_col), ord_col).alias(out_col)))
