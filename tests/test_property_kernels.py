"""Hypothesis property tests for the reference scalar kernels
(SURVEY.md §5.4): invariants that must hold for EVERY input, not just
the golden boundary rows. Each example ships a whole batch of rows
through one Spark job to keep the 15-example budget fast."""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from stock_data_warehouse_spark.functions.classify import (
    SECTOR_CONFIG, clamp_growth, classify_sector, sanitize_beta,
)

_sane_float = st.one_of(
    st.none(),
    st.floats(min_value=-1e6, max_value=1e6,
              allow_nan=False, allow_infinity=False))
_cap = st.one_of(st.none(),
                 st.integers(min_value=0, max_value=2_000_000_000_000))
_sector = st.sampled_from(sorted(SECTOR_CONFIG) + ["Hardware"])

_growth_row = st.tuples(_sane_float, _sane_float, _sane_float,
                        _cap, _sector)


@settings(max_examples=15, deadline=None)
@given(st.lists(_growth_row, min_size=1, max_size=40))
def test_clamp_growth_always_lands_inside_sector_bounds(spark, rows):
    """For every input whatsoever, the clamped growth must land in
    [min_growth, max_growth] of the row's (General-defaulted) sector —
    the cyclical 3.0 override and the mega-cap 30 cap both live inside
    those bounds for the sectors where they can fire."""
    df = spark.createDataFrame(
        rows, "pe double, peg double, rg double, cap long, sector string")
    out = df.select(
        "sector",
        clamp_growth(F.col("pe"), F.col("peg"), F.col("rg"),
                     F.col("cap"), F.col("sector")).alias("g")).collect()
    for r in out:
        cfg = SECTOR_CONFIG.get(r["sector"], SECTOR_CONFIG["General"])
        assert cfg["min"] <= r["g"] <= cfg["max"], (r["sector"], r["g"])


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(_sane_float, _cap, _sector),
                min_size=1, max_size=40))
def test_sanitize_beta_always_lands_in_half_to_2p5(spark, rows):
    """Every sanitized beta lies in [0.5, 2.5]; null input maps to
    exactly 1.0."""
    df = spark.createDataFrame(
        rows, "beta double, cap long, sector string")
    out = df.select(
        "beta",
        sanitize_beta(F.col("beta"), F.col("sector"),
                      F.col("cap")).alias("b")).collect()
    for r in out:
        if r["beta"] is None:
            assert r["b"] == 1.0
        assert 0.5 <= r["b"] <= 2.5, r["b"]


@settings(max_examples=15, deadline=None)
@given(st.lists(st.tuples(st.text(max_size=30), st.text(max_size=30)),
                min_size=1, max_size=40))
def test_classifier_semiconductor_precedence_is_absolute(spark, rows):
    """Any row whose industry mentions Semiconductor classifies as
    Semiconductor no matter what else the strings contain — and every
    output is one of the 8 enum values (F:53-66)."""
    enum8 = {"Semiconductor", "SaaS", "Hardware", "BioTech", "Financial",
             "Energy/Utility", "REIT", "General"}
    rows = [(s, i + "Semiconductor") for s, i in rows[: len(rows) // 2]] \
        + [tuple(r) for r in rows[len(rows) // 2:]]
    df = spark.createDataFrame(rows, "sector string, industry string")
    out = df.select(
        "industry",
        classify_sector(F.col("sector"), F.col("industry")).alias("c")
    ).collect()
    for r in out:
        assert r["c"] in enum8
        if "Semiconductor" in r["industry"]:
            assert r["c"] == "Semiconductor"


@settings(max_examples=10, deadline=None)
@given(st.lists(
    st.lists(st.floats(min_value=-1e8, max_value=1e8,
                       allow_nan=False, allow_infinity=False),
             min_size=0, max_size=6),
    min_size=1, max_size=25))
def test_arr6_matches_duckdb_twin(spark, arrays):
    """Property: the Spark array-to-string serializer (_arr6) and its
    DuckDB SQL twin (_sql_arr6) render EVERY double array to the same
    canonical string — the driver-hashable contract every array-valued
    result column now routes through."""
    import duckdb

    from stock_data_warehouse_spark.plans.scalar import _arr6, _sql_arr6

    rows = [(i, arr) for i, arr in enumerate(arrays)]
    df = spark.createDataFrame(rows, "id long, arr array<double>")
    got = {r["id"]: r["s"]
           for r in df.select("id", _arr6(F.col("arr")).alias("s"))
                      .collect()}
    con = duckdb.connect()
    for i, arr in rows:
        lit = "[" + ",".join(repr(x) for x in arr) + "]::DOUBLE[]"
        want = con.execute(
            f"SELECT {_sql_arr6(lit)}").fetchone()[0]
        assert got[i] == want, (arr, got[i], want)
