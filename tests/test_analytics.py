"""Analytics pack: pivot/unpivot round-trip, gap-fill density,
funnel/cohort invariants."""

from pyspark.sql import functions as F

from stock_data_warehouse_spark.plans import analytics as A

SF = "/root/testdata/sf0.001"


def test_pivot_unpivot_roundtrip(spark):
    wide = A.a12_pivot_segment_counts(spark, SF)
    long = A.a13_unpivot_segment_counts(spark, SF)
    total_wide = wide.select(
        sum(F.col(c) for c in wide.columns
            if c.startswith("n_")).alias("t")
    ).agg(F.sum("t")).collect()[0][0]
    total_long = long.agg(F.sum("n_customers")).collect()[0][0]
    n_customers = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert total_wide == total_long == n_customers


def test_gapfill_spine_is_dense(spark):
    out = A.t9_gapfill_hourly(spark, SF).orderBy("hour").collect()
    assert out
    hours = [r["hour"] for r in out]
    deltas = {(b - a).total_seconds()
              for a, b in zip(hours, hours[1:])}
    assert deltas == {3600.0}  # no missing spine rows
    for r in out:
        assert r["is_gap"] == (r["n_events"] == 0)


def test_funnel_monotone(spark):
    for r in A.f1_signup_purchase_funnel(spark, SF).collect():
        assert (r["n_signed_up"] >= r["n_converted"]
                >= r["n_converted_72h"] >= 0)


def test_cohort_week0_counts_every_user(spark):
    out = A.f2_weekly_cohort_retention(spark, SF)
    week0 = (out.filter(F.col("week_offset") == 0)
                .agg(F.sum("n_active_users")).collect()[0][0])
    n_users = (spark.read.parquet(f"{SF}/events.parquet")
               .select("user_id").distinct().count())
    assert week0 == n_users  # everyone is active in their cohort week
    assert out.filter(F.col("week_offset") < 0).count() == 0


def test_scd2_history_invariants(spark):
    """Runs collapse (consecutive versions change status), intervals
    chain per customer, exactly one open (current) row each."""
    rows = (A.t10_scd2_history(spark, SF)
             .orderBy("custkey", "version").collect())
    assert rows
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["custkey"], []).append(r)
    for hist in by_cust.values():
        assert [h["version"] for h in hist] == list(
            range(1, len(hist) + 1))
        assert sum(h["valid_to"] is None for h in hist) == 1
        assert hist[-1]["valid_to"] is None  # open row is the last
        for a, b in zip(hist, hist[1:]):
            assert a["status"] != b["status"]  # runs collapsed
            assert a["valid_to"] == b["valid_from"]  # intervals chain


def test_continuous_rollup_matches_direct_daily(spark):
    """The two-layer (hourly→daily) rollup must equal a direct daily
    aggregation off raw events — the losslessness obligation of the
    continuous-aggregate pattern."""
    from pyspark.sql import functions as F
    from stock_data_warehouse_spark.plans.timeseries import (
        t17_continuous_rollup,
    )
    from stock_data_warehouse_spark.sources.tables import load_table
    sf = "/root/testdata/sf0.001"
    layered = {((r["day"], r["event_type"])): r
               for r in t17_continuous_rollup(spark, sf).collect()}
    direct = (load_table(spark, sf, "events")
              .groupBy(F.date_trunc("day", "ts").alias("day"), "event_type")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 4).alias("sum_value"),
                   F.min("value").alias("min_value"),
                   F.max("value").alias("max_value"))
              .collect())
    assert len(direct) == len(layered)
    for r in direct:
        l = layered[(r["day"], r["event_type"])]
        assert l["n_events"] == r["n_events"]
        assert abs(l["sum_value"] - r["sum_value"]) < 1e-6
        assert l["min_value"] == r["min_value"]
        assert l["max_value"] == r["max_value"]
        assert 1 <= l["n_active_hours"] <= 24


def test_interpolation_bounded_by_neighbors(spark):
    """Interpolated points lie within [min, max] of their surrounding
    observations; observed points pass through unchanged; the grid is
    dense (n_types x n_hours rows)."""
    from stock_data_warehouse_spark.plans.analytics import (
        t9_gapfill_hourly, t19_interpolate_gaps,
    )
    out = t19_interpolate_gaps(spark, SF)
    rows = out.orderBy("event_type", "hour").collect()
    assert rows
    n_hours = t9_gapfill_hourly(spark, SF).count()
    n_types = (spark.read.parquet(f"{SF}/events.parquet")
               .select("event_type").distinct().count())
    assert len(rows) == n_hours * n_types
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for series in by_type.values():
        observed = [(i, r["value_filled"]) for i, r in enumerate(series)
                    if not r["is_interpolated"]]
        assert observed
        for i, r in enumerate(series):
            if not r["is_interpolated"]:
                continue
            prev = [v for j, v in observed if j < i]
            nxt = [v for j, v in observed if j > i]
            lo_hi = ([prev[-1]] if prev else []) + ([nxt[0]] if nxt else [])
            assert min(lo_hi) - 1e-9 <= r["value_filled"] <= max(lo_hi) + 1e-9


def test_pareto_skyline_sound_and_complete(spark):
    """Soundness: no skyline row dominates another. Completeness: every
    non-skyline order is dominated by at least one skyline row —
    together these pin the bucket-prefilter argument (a pruned
    dominator always implies a candidate dominator)."""
    from stock_data_warehouse_spark.plans.relational import (
        o6_pareto_skyline,
    )
    from stock_data_warehouse_spark.sources.tables import load_table
    sf = "/root/testdata/sf0.001"
    sky = [(r["o_orderdate"], r["o_totalprice"], r["o_orderkey"])
           for r in o6_pareto_skyline(spark, sf).collect()]
    all_rows = [(r["o_orderdate"], r["o_totalprice"], r["o_orderkey"])
                for r in load_table(spark, sf, "orders")
                    .select("o_orderdate", "o_totalprice", "o_orderkey")
                    .collect()]
    assert sky

    def dominates(a, b):
        return (a[0] >= b[0] and a[1] >= b[1]
                and (a[0] > b[0] or a[1] > b[1]))

    for a in sky:
        assert not any(dominates(b, a) for b in sky if b[2] != a[2]
                       and (b[0], b[1]) != (a[0], a[1]))
    sky_keys = {s[2] for s in sky}
    for row in all_rows:
        if row[2] not in sky_keys:
            assert any(dominates(s, row) for s in sky), row


def test_heavy_hitters_containment_any_partitioning(spark):
    """The MG summary itself varies with partitioning; the THEOREMS may
    not: on a skewed crafted stream, every token with count > N/(m+1)
    must be in the sketch and every estimate must underestimate within
    N/(m+1) — at 1, 7 and 32 partitions."""
    import pandas as pd
    from stock_data_warehouse_spark.plans.analytics import _MG_M
    from pyspark.sql import functions as F

    m = _MG_M
    # 2 giants (8k + 4k), 50 mid (100 each), long tail of singletons
    toks = (["giant_a"] * 8000 + ["giant_b"] * 4000
            + [f"mid_{i}" for i in range(50) for _ in range(100)]
            + [f"tail_{i}" for i in range(5000)])
    n = len(toks)
    pdf = pd.DataFrame({"tok": toks})
    base = spark.createDataFrame(pdf)
    exact = {t: toks.count(t) for t in ("giant_a", "giant_b")}
    for parts in (1, 7, 32):
        df = base.repartition(parts)

        def mg_partition(batches):
            summary = pd.Series(dtype="int64")
            for b in batches:
                vc = b["tok"].value_counts()
                summary = summary.add(vc, fill_value=0).astype("int64")
                if len(summary) > m:
                    d = summary.nlargest(m + 1).iloc[-1]
                    summary = summary[summary > d] - d
            yield pd.DataFrame({"tok": summary.index.astype(str),
                                "w": summary.to_numpy(dtype="int64")})

        merged = (df.mapInPandas(mg_partition, "tok string, w long")
                    .groupBy("tok").agg(F.sum("w").alias("w")))
        rows = {r["tok"]: r["w"] for r in merged.collect()}
        for t, c in exact.items():
            assert c * (m + 1) > n          # really heavy
            assert t in rows, (parts, t)
            assert rows[t] <= c, (parts, t, rows[t], c)
            assert (c - rows[t]) * (m + 1) <= n, (parts, t)
