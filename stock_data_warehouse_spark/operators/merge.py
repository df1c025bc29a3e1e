"""Batch MERGE INTO — row-level upsert/delete application, the CDC
companion to the whole-snapshot publish in ``sources/sinks.py``
(OP-S8/T2). The reference republishes entire per-ticker records every
run (fetch_data.py:312-314, commit-if-changed update.yml:33-39); at
warehouse scale the same refresh arrives as a keyed change feed, and
applying it is a single full-outer join:

- matched  + op 'U' → take the change row's payload
- matched  + op 'D' → drop the row
- unmatched target  → keep as-is
- change-only + 'I' → insert
- change-only + 'U'/'D' → no-op (update/delete of a missing key)

Scale posture (100 TB): ONE shuffle, keyed on the merge key on both
sides — the change feed is usually a small fraction of the target, so
AQE broadcasts it and the target never shuffles at all. Deterministic:
the caller guarantees at most one change row per key (enforced here),
so the merge is retry-stable and idempotent for 'U'/'D'.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_into(target: DataFrame, changes: DataFrame, key: str,
               payload_cols: Sequence[str],
               op_col: str = "op") -> DataFrame:
    """Apply ``changes(key, op, *payload_cols)`` to
    ``target(key, *payload_cols)``; ``op`` ∈ {'I','U','D'}. Returns the
    merged relation with the same columns as ``target``.
    """
    t = target.alias("t")
    c = changes.alias("c")
    tk, ck = F.col(f"t.{key}"), F.col(f"c.{key}")
    op = F.col(f"c.{op_col}")
    matched = tk.isNotNull() & ck.isNotNull()
    take_change = matched & (op == "U") | tk.isNull() & (op == "I")
    keep = ~(matched & (op == "D")) & ~(tk.isNull() & op.isin("U", "D"))
    return (t.join(c, tk == ck, "full_outer")
             .filter(keep)
             .select(
                 F.coalesce(tk, ck).alias(key),
                 *[F.when(take_change, F.col(f"c.{p}"))
                    .otherwise(F.col(f"t.{p}")).alias(p)
                   for p in payload_cols]))
