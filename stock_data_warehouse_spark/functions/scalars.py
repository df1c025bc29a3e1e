"""Scalar Column builders — OP-P1…P18 (SURVEY.md §2.2).

Pure functions ``Column -> Column`` so they compose into any plan and
unit-test in isolation. All native Spark SQL expressions — no Python
UDFs — so every kernel stays inside whole-stage codegen (the reference's
interpreted pandas scalar layer re-expressed JVM-side).

Reference semantics cited per function (``F:`` = reference
``fetch_data.py``; studied at /root/reference, not copied).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_ticker(c: Column) -> Column:
    """OP-P1 — ``'.' -> '-'`` (``BRK.B`` -> ``BRK-B``); ref F:130."""
    return F.translate(c, ".", "-")


def canonicalize_line(c: Column) -> Column:
    """OP-P2 — ``strip().upper()`` of a raw list line; ref F:294.

    Blank-drop is a separate ``filter(length(...) > 0)`` at the call
    site so the builder stays a pure projection.
    """
    return F.upper(F.trim(c))


def coalesce_positive(*cols: Column, default: Column | None = None) -> Column:
    """OP-P3 + OP-P4 — first *strictly positive* value in the chain.

    The reference's price cascade (F:142-165) and FX-rate cascade
    (F:45-48) both treat ``<= 0`` as invalid, not merely null.
    """
    guarded = [F.when(c > 0, c) for c in cols]
    if default is not None:
        guarded.append(default)
    return F.coalesce(*guarded)


def guarded_ratio(num: Column, den: Column) -> Column:
    """OP-P5 — ``num/den`` only when both present and ``den > 0``; else 0.

    Ref F:84-89 (trailingPE / pegRatio implied-growth seed).
    """
    return F.when(
        num.isNotNull() & den.isNotNull() & (den > 0), num / den
    ).otherwise(F.lit(0.0))


def fallback_cascade(primary: Column, secondary: Column,
                     final_default: float = 3.0) -> Column:
    """OP-P6 — if ``primary`` is 0/null use ``secondary``; if that is
    null too, a literal default. Ref F:91-96 (implied growth →
    revenueGrowth×100 → 3.0).
    """
    return F.when(
        primary.isNotNull() & (primary != 0), primary
    ).otherwise(F.coalesce(secondary, F.lit(final_default)))


def fx_pair(currency: Column) -> Column:
    """OP-P14 — FX ticker template ``f"{CUR}=X"``; ref F:43."""
    return F.concat(F.upper(currency), F.lit("=X"))


def scale_pct(c: Column) -> Column:
    """OP-P9 — unit scaling ×100. NOTE the reference's dividend-yield
    double-scaling quirk (upstream value already percent; observed
    709.0) is replicated verbatim by applying this anyway (F:243).
    """
    return c * F.lit(100.0)


def round2(c: Column) -> Column:
    """OP-P10 — ``round(x, 2)``, HALF_UP on the double's shortest
    decimal rendering (Spark semantics). CPython ``round`` is banker's;
    DuckDB ``ROUND`` on DOUBLE rounds the *binary* value — all three
    disagree at half-cent boundaries (e.g. 72091.275 → 72091.28 /
    72091.27). SURVEY.md §7 hard-part 1: use :func:`round_money` when
    the result must hash-match the DuckDB oracle.
    """
    return F.round(c, 2)


def round_money(c: Column, scale: int = 2) -> Column:
    """Tie-stable rounding for oracle parity (SURVEY.md §7 hard-part 1).

    Route through DECIMAL(38,10) so tie-breaking is identical on both
    engines: Spark mirrors
    ``CAST(ROUND(CAST(x AS DECIMAL(38,10)), s) AS DOUBLE)`` in DuckDB —
    the double→decimal cast canonicalizes the binary value the same way
    on both sides, and decimal ROUND is HALF_UP on both.
    """
    return F.round(c.cast("decimal(38,10)"), scale).cast("double")
