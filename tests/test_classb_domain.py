"""Class-B rounding-domain audit (VERDICT r4 item 4).

The repo's two-kernel rounding taxonomy
(functions/scalars.py::round_half_up) retains the DECIMAL(38,10) route
ONLY for class-B sites — noise-carrying inputs (cross-engine SUM/AVG
accumulation order, non-correctly-rounded libm) — and that route is
valid ONLY while |x| ≪ 9e5: beyond |x|·10^10 ≳ 2^53 Spark's exact
double→decimal cast and DuckDB's double-quantized one see *different
decimals* (falsified counterexample pinned in
tests/test_property_kernels.py).

This module is the registry of every class-B site in the engine plus
the `_arr6` floor-kernel domain, asserting each site's documented
bound actually holds on all three shipped SFs — so a future query (or
a testdata regen) cannot silently leave the validity domain. If you
add a DECIMAL(38,10)-routed column, ADD A ROW HERE.

Bounds are checked Spark-side (max |x| aggregations), never via
collect of the data itself.
"""

import pytest
from pyspark.sql import functions as F

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
       "/root/testdata/sf0.1"]

#: Every DECIMAL(38,10)-routed (class-B) output column in the engine:
#: (query, column, bound). Bound is an order of magnitude *inside* the
#: 9e5 validity wall, per each site's docstring:
#:  - t4 avg_value / t19 value_filled: averages (and convex
#:    interpolations of averages) of events.value — bounded by
#:    max|value|, asserted ≤ 9e4;
#:  - w7 share_of_region: a ratio of a part to its total, |x| ≤ 1;
#:  - x4 avg_logprob: a mean of ln(p), |x| ≤ ln(corpus tokens) ≲ 100.
CLASS_B_SCALAR_SITES = [
    ("t4_tumbling_hourly", "avg_value", 9e4),        # timeseries.py
    ("t19_interpolate_gaps", "value_filled", 9e4),   # analytics.py
    ("w7_ratio_to_report", "share_of_region", 1.0 + 1e-9),  # windows.py
    ("x4_unigram_logprob", "avg_logprob", 100.0),    # extensions.py
]

#: _arr6 floor-kernel sites (class A but with its own BIGINT domain:
#: |x|·10^6 must fit a LONG, i.e. |x| ≲ 9.2e12; property-tested at
#: ±1e9 — assert the shipped data stays inside the tested range).
ARR6_CSV_SITES = [
    ("p_collection_pack",
     ["arr", "doubled", "sorted_arr", "first_two"], 1e9),
]


def _queries():
    import __spark_entry__ as entry_mod
    return entry_mod.queries()


@pytest.mark.parametrize("sf", SFS)
@pytest.mark.parametrize("qname,col,bound", CLASS_B_SCALAR_SITES)
def test_classb_scalar_site_within_domain(spark, sf, qname, col, bound):
    df = _queries()[qname](spark, sf)
    mx = df.agg(F.max(F.abs(F.col(col))).alias("m")).collect()[0]["m"]
    assert mx is not None
    assert mx <= bound, (
        f"{qname}.{col} reaches |x|={mx} at {sf} — outside the "
        f"documented class-B bound {bound} (decimal route valid only "
        "for |x| << 9e5)")


@pytest.mark.parametrize("sf", SFS)
@pytest.mark.parametrize("qname,cols,bound", ARR6_CSV_SITES)
def test_arr6_site_within_domain(spark, sf, qname, cols, bound):
    df = _queries()[qname](spark, sf)
    exprs = []
    for c in cols:
        vals = F.transform(F.split(F.col(c), ","),
                           lambda x: F.abs(x.cast("double")))
        exprs.append(F.max(F.array_max(vals)).alias(c))
    row = df.agg(*exprs).collect()[0]
    for c in cols:
        assert row[c] is not None
        assert row[c] <= bound, (
            f"{qname}.{c} element reaches |x|={row[c]} at {sf} — "
            f"outside the property-tested _arr6 domain ±{bound}")
