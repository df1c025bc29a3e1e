"""Golden tests for the quirk-faithful scalar kernels (SURVEY.md §5.3).

Every expected value is hand-derived from the reference semantics
(/root/reference/fetch_data.py — F:53-66 classifier precedence,
F:68-108 growth clamp, F:110-124 beta tiers, F:130 normalization,
F:142-165 truthiness price cascade).
"""

import pytest

from pyspark.sql import functions as F

from stock_data_warehouse_spark.functions.classify import (
    classify_sector, clamp_growth, sanitize_beta,
)
from stock_data_warehouse_spark.functions.scalars import (
    coalesce_positive, normalize_ticker, round_money,
)


def _one(spark, schema: str, row: tuple, expr, out="out"):
    df = spark.createDataFrame([row], schema)
    return df.select(expr.alias(out)).collect()[0][out]


# --- OP-P1 -----------------------------------------------------------------

def test_normalize_ticker(spark):
    rows = spark.createDataFrame(
        [("BRK.B",), ("AAPL",), ("A.B.C",)], "t string"
    ).select(normalize_ticker(F.col("t")).alias("n")).collect()
    assert [r["n"] for r in rows] == ["BRK-B", "AAPL", "A-B-C"]


# --- OP-P3/P4 --------------------------------------------------------------

@pytest.mark.parametrize("vals,expected", [
    ((100.0, 99.0, 98.0), 100.0),
    ((None, 99.0, 98.0), 99.0),
    ((0.0, None, 98.0), 98.0),     # zero is invalid → fall through
    ((-1.0, 99.0, None), 99.0),    # negative invalid in guarded form
    ((None, None, None), None),
])
def test_coalesce_positive(spark, vals, expected):
    got = _one(spark, "a double, b double, c double", vals,
               coalesce_positive(F.col("a"), F.col("b"), F.col("c")))
    assert got == expected


# --- OP-P10 ----------------------------------------------------------------

def test_round_money_half_cent_tie(spark):
    # The double 72091.275 stores as 72091.27499…; plain double ROUND
    # diverges across engines (DuckDB: 72091.27 from the binary value,
    # Spark: 72091.28 from the shortest repr). Since round 4 the
    # kernel is floor-based half-up on the BINARY value (the only
    # definition both engines compute bit-identically — the
    # shortest-repr decimal route was falsified, VERDICT r3 item 1),
    # so a stored-below-tie double rounds DOWN on both engines —
    # unless the |x|·100 multiply itself correctly-rounds back onto
    # the tie (2.67499…×100 → exactly 267.5), in which case half-up
    # fires; either way both engines compute the identical result.
    got = _one(spark, "x double", (72091.275,), round_money(F.col("x")))
    assert got == 72091.27
    got = _one(spark, "x double", (2.675,), round_money(F.col("x")))
    assert got == 2.68
    # An exactly-representable tie rounds half-up (away from zero).
    got = _one(spark, "x double", (0.125,), round_money(F.col("x")))
    assert got == 0.13
    got = _one(spark, "x double", (-0.125,), round_money(F.col("x")))
    assert got == -0.13


# --- OP-P13 — classifier precedence (F:58-66) ------------------------------

@pytest.mark.parametrize("sector,industry,expected", [
    ("Technology", "Semiconductor Software", "Semiconductor"),  # beats SaaS
    ("Technology", "Software - Application", "SaaS"),
    ("Technology Services", None, "SaaS"),
    (None, "Consumer Electronics", "Hardware"),
    (None, "Biotechnology", "BioTech"),
    ("Financial Services", "Insurance Brokers", "Financial"),
    ("Energy", "Oil & Gas Midstream", "Energy/Utility"),
    ("Real Estate", "REIT - Retail", "REIT"),
    (None, None, "General"),
    ("Utilities - Regulated", "Electric", "Energy/Utility"),
])
def test_classify_sector(spark, sector, industry, expected):
    got = _one(spark, "s string, i string", (sector, industry),
               classify_sector(F.col("s"), F.col("i")))
    assert got == expected


# --- OP-P11 + P5/P6 — growth clamp (F:68-108) ------------------------------

@pytest.mark.parametrize("pe,peg,rg,cap,sector,expected", [
    (20.0, 2.0, None, 1e9, "General", 10.0),          # pe/peg plain
    (None, None, 0.25, 1e9, "SaaS", 25.0),            # revenueGrowth×100
    (None, None, None, 1e9, "General", 3.0),          # literal default
    (10.0, 0.0, 0.5, 1e9, "General", 20.0),           # peg=0 falsy → 50→max
    (100.0, 1.0, None, 6e11, "Semiconductor", 30.0),  # 100→60→megacap 30
    (-12.0, 2.0, None, 1e9, "General", -2.0),         # below min, not cyc
    (-12.0, 2.0, None, 1e9, "Semiconductor", 3.0),    # below min, cyclical
    (40.0, 2.0, None, 1e9, "Hardware", 20.0),         # unknown cfg → General
    (9.0, 1.0, None, 1e9, "REIT", 9.0),               # inside [0,10]
])
def test_clamp_growth(spark, pe, peg, rg, cap, sector, expected):
    got = _one(
        spark,
        "pe double, peg double, rg double, cap long, st string",
        (pe, peg, rg, int(cap), sector),
        clamp_growth(F.col("pe"), F.col("peg"), F.col("rg"),
                     F.col("cap"), F.col("st")))
    assert got == expected


# --- OP-P12 — beta tiers (F:110-124) ---------------------------------------

@pytest.mark.parametrize("beta,sector,cap,expected", [
    (None, "General", 1e9, 1.0),
    (0.4, "SaaS", 1e9, 1.2),              # growth sector floor
    (0.4, "General", 1e9, 0.8),
    (0.5, "General", 1e9, 0.5),           # boundary: not < 0.5
    (1.5, "General", 2e12, 1.35),         # $1T tier cap
    (1.2, "General", 2e12, 1.2),          # $1T tier, under cap
    (1.7, "General", 3e11, 1.6),          # $200B tier cap
    (1.7, "General", 1e12, 1.6),          # exactly 1e12 → $200B tier
    (2.8, "General", 1e9, 2.5),           # global cap
    (2.5, "General", 1e9, 2.5),           # boundary: not > 2.5
    (1.13, "General", 1e9, 1.13),         # plain round
])
def test_sanitize_beta(spark, beta, sector, cap, expected):
    got = _one(
        spark, "b double, st string, cap long",
        (beta, sector, int(cap)),
        sanitize_beta(F.col("b"), F.col("st"), F.col("cap")))
    assert got == expected


def test_round_money_parity_vs_duckdb_batch(spark):
    """Cross-engine property: the floor-based half-up kernel agrees
    with its SQL twin on adversarial half-boundary doubles (the exact
    class that broke round 1, plus the dyadic ties that falsified the
    round-1..3 decimal route)."""
    import duckdb

    from stock_data_warehouse_spark.functions.scalars import (
        sql_round_half_up,
    )

    vals = [round(i * 0.005, 10) for i in range(1, 400)]       # x.xx5 ties
    vals += [i + 0.275 for i in range(100)] + [2.675, 72091.275]
    vals += [m / 8 for m in range(-40, 40)]                    # dyadic ties
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r["y"] for r in
           df.select(round_money(F.col("x")).alias("y"))
             .orderBy("x").collect()]
    con = duckdb.connect()
    expected = [
        r[0] for r in con.execute(
            f"SELECT {sql_round_half_up('x', 2)}"
            " FROM (SELECT unnest(?::DOUBLE[]) AS x) ORDER BY x",
            [sorted(vals)]).fetchall()]
    assert got == expected
