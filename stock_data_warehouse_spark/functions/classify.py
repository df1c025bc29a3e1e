"""Rule-based classification + clamp kernels — OP-P11/P12/P13.

Faithful re-expressions of the reference's scalar rules as native
``when`` chains (reference ``fetch_data.py``; semantics only, no code
copied):

- ``classify_sector``   — F:53-66  (substring precedence, 8-value enum)
- ``clamp_growth``      — F:68-108 (sector clamp + cyclical override +
                          mega-cap hard cap)
- ``sanitize_beta``     — F:110-124 (tiered clamp)

Python-truthiness quirks are preserved deliberately: ``if pe and peg``
treats 0 as absent, ``if raw_roe`` maps 0.0 to the default branch.
Golden tests in ``tests/test_reference_kernels.py`` pin boundary values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F:72-80 — inline sector config; 'Hardware' intentionally absent and
# falls back to the General row (F:82).
SECTOR_CONFIG: dict[str, dict] = {
    "Semiconductor":  {"max": 60.0, "min": -5.0,  "cyclical": True},
    "SaaS":           {"max": 45.0, "min": 0.0,   "cyclical": False},
    "BioTech":        {"max": 40.0, "min": -10.0, "cyclical": True},
    "Financial":      {"max": 15.0, "min": 0.0,   "cyclical": True},
    "REIT":           {"max": 10.0, "min": 0.0,   "cyclical": False},
    "Energy/Utility": {"max": 10.0, "min": -5.0,  "cyclical": True},
    "General":        {"max": 20.0, "min": -2.0,  "cyclical": False},
}


def classify_sector(sector: Column, industry: Column) -> Column:
    """OP-P13 — ordered substring tests; first match wins (F:58-66).

    Null sector/industry behave like '' (``dict.get(k, '')`` upstream).
    """
    s = F.coalesce(sector, F.lit(""))
    i = F.coalesce(industry, F.lit(""))
    return (
        F.when(i.contains("Semiconductor") | s.contains("Semiconductor"),
               "Semiconductor")
        .when(i.contains("Software") | s.contains("Technology Services"),
              "SaaS")
        .when(i.contains("Consumer Electronics") | i.contains("Computer Hardware"),
              "Hardware")
        .when(i.contains("Biotechnology") | i.contains("Drug"), "BioTech")
        .when(i.contains("Bank") | s.contains("Financial") | i.contains("Insurance"),
              "Financial")
        .when(s.contains("Energy") | i.contains("Oil") | s.contains("Utilities"),
              "Energy/Utility")
        .when(s.contains("Real Estate") | i.contains("REIT"), "REIT")
        .otherwise("General")
    )


def _config_col(sector_type: Column, key: str) -> Column:
    """Inline SECTOR_CONFIG lookup with General fallback (F:82)."""
    expr = F.lit(SECTOR_CONFIG["General"][key])
    chain = None
    for name, cfg in SECTOR_CONFIG.items():
        cond = sector_type == name
        chain = (F.when(cond, F.lit(cfg[key])) if chain is None
                 else chain.when(cond, F.lit(cfg[key])))
    return chain.otherwise(expr)


def clamp_growth(trailing_pe: Column, peg_ratio: Column,
                 revenue_growth: Column, market_cap: Column,
                 sector_type: Column) -> Column:
    """OP-P5 + OP-P6 + OP-P11 — the full sane-growth pipeline (F:68-108).

    1. implied = pe/peg when both truthy and peg>0, else 0   (F:84-89)
    2. 0 → revenueGrowth*100 → 3.0                           (F:91-96)
    3. clamp: < min → (3.0 if cyclical else min); > max → max (F:98-103)
    4. mega-cap: cap>5e11 and growth>30 → 30.0               (F:105-106)
    5. round(x, 2)                                           (F:108)
    """
    implied = F.when(
        trailing_pe.isNotNull() & (trailing_pe != 0)
        & peg_ratio.isNotNull() & (peg_ratio > 0),
        trailing_pe / peg_ratio,
    ).otherwise(F.lit(0.0))
    implied = F.when(implied != 0, implied).otherwise(
        F.coalesce(revenue_growth * 100, F.lit(3.0))
    )
    cfg_min = _config_col(sector_type, "min")
    cfg_max = _config_col(sector_type, "max")
    cyclical = _config_col(sector_type, "cyclical")
    clamped = (
        F.when(implied < cfg_min,
               F.when(cyclical, F.lit(3.0)).otherwise(cfg_min))
        .when(implied > cfg_max, cfg_max)
        .otherwise(implied)
    )
    capped = F.when(
        (F.coalesce(market_cap, F.lit(0)) > 500_000_000_000) & (clamped > 30),
        F.lit(30.0),
    ).otherwise(clamped)
    return F.round(capped, 2)


def sanitize_beta(raw_beta: Column, sector_type: Column,
                  market_cap: Column) -> Column:
    """OP-P12 — tiered beta clamp (F:110-124).

    null→1.0; <0.5 → 1.2 for growth sectors else 0.8; >1.35 capped at
    1.35 above $1T, >1.6 capped at 1.6 above $200B (elif — the $1T tier
    shadows the $200B one); >2.5 → 2.5; else round(raw, 2).
    """
    cap = F.coalesce(market_cap, F.lit(0))
    growth_sector = sector_type.isin("SaaS", "Semiconductor", "BioTech")
    return (
        F.when(raw_beta.isNull(), F.lit(1.0))
        .when(raw_beta < 0.5, F.when(growth_sector, 1.2).otherwise(0.8))
        .when((cap > 1_000_000_000_000) & (raw_beta > 1.35), F.lit(1.35))
        .when((cap > 1_000_000_000_000), F.round(raw_beta, 2))
        .when((cap > 200_000_000_000) & (raw_beta > 1.6), F.lit(1.6))
        .when(raw_beta > 2.5, F.lit(2.5))
        .otherwise(F.round(raw_beta, 2))
    )
