"""Unit truths for operators/staircase.py: every two-level
decomposition must equal its single-window denotation EXACTLY, on
adversarial data (heavy ties, negative values, singleton and empty
buckets) and regardless of input partitioning — the properties the
oracle checks only witness on the shipped datasets."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from stock_data_warehouse_spark.operators.staircase import (
    bucketed_cumsum, bucketed_exact_quantiles, bucketed_lag,
    bucketed_row_number, bucketed_running_max, default_value_bucket,
)


@pytest.fixture(scope="module")
def adversarial(spark):
    """200 rows, 2 groups, values drawn to maximize edge cases:
    long tie runs (v % 7), negatives, a few extreme magnitudes —
    materialized at 13 partitions so local windows see ragged
    splits."""
    rows = []
    for i in range(200):
        g = "g1" if i % 3 else "g0"
        v = (i * i * 2654435761) % 7 - 2          # tie-heavy, ±
        if i % 41 == 0:
            v = (-1) ** i * (10 ** (i % 5)) * 37  # magnitude spikes
        rows.append((g, i, v))
    df = spark.createDataFrame(rows, "grp string, id long, v long")
    return df.repartition(13).localCheckpoint()


def _with_bucket(df):
    return df.withColumn("_b", default_value_bucket(F.col("v")))


def test_bucketed_row_number_matches_window(adversarial):
    got = bucketed_row_number(
        _with_bucket(adversarial), ["grp"], ["_b"], [F.col("_b")],
        [F.col("v"), F.col("id")], out="rn")
    w = Window.partitionBy("grp").orderBy("v", "id")
    want = adversarial.withColumn("rn",
                                  F.row_number().over(w).cast("long"))
    assert sorted(got.select("grp", "id", "rn").collect()) \
        == sorted(want.select("grp", "id", "rn").collect())


def test_bucketed_cumsum_matches_window(adversarial):
    got = bucketed_cumsum(
        _with_bucket(adversarial), ["grp"], ["_b"], [F.col("_b")],
        [F.col("v"), F.col("id")], F.col("v"), out="c")
    w = (Window.partitionBy("grp").orderBy("v", "id")
               .rowsBetween(Window.unboundedPreceding, 0))
    want = adversarial.withColumn("c",
                                  F.sum("v").over(w).cast("long"))
    assert sorted(got.select("grp", "id", "c").collect()) \
        == sorted(want.select("grp", "id", "c").collect())


def test_bucketed_running_max_matches_window(adversarial):
    # order by id, blocks of 16 — the t35 frontier shape
    b = adversarial.withColumn("_b", F.floor(F.col("id") / 16))
    got = bucketed_running_max(
        b, ["grp"], ["_b"], [F.col("_b")], [F.col("id")],
        F.col("v"), out="m")
    w = (Window.partitionBy("grp").orderBy("id")
               .rowsBetween(Window.unboundedPreceding, 0))
    want = adversarial.withColumn("m", F.max("v").over(w))
    assert sorted(got.select("grp", "id", "m").collect()) \
        == sorted(want.select("grp", "id", "m").collect())


def test_bucketed_lag_matches_window(adversarial):
    b = adversarial.withColumn("_b", F.floor(F.col("id") / 16))
    got = bucketed_lag(b, ["grp"], ["_b"], [F.col("_b")],
                       [F.col("id")], "v", out="p")
    w = Window.partitionBy("grp").orderBy("id")
    want = adversarial.withColumn("p", F.lag("v").over(w))
    assert sorted((r["grp"], r["id"], r["p"])
                  for r in got.collect()) \
        == sorted((r["grp"], r["id"], r["p"])
                  for r in want.collect())


def test_bucketed_quantiles_match_percentile(adversarial):
    got = {r["grp"]: (r["n"], r["q0"], r["q1"], r["q2"])
           for r in bucketed_exact_quantiles(
               adversarial, ["grp"], "v",
               [0.5, 0.95, 0.99]).collect()}
    want = {r["grp"]: (r["n"], r["q0"], r["q1"], r["q2"])
            for r in adversarial.groupBy("grp").agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("percentile(v, 0.5)").alias("q0"),
                F.expr("percentile(v, 0.95)").alias("q1"),
                F.expr("percentile(v, 0.99)").alias("q2")).collect()}
    assert got == want  # bit-exact, including interpolated fractions


def test_quantiles_partition_free_group(adversarial):
    """The part_cols=[] path (a45's global form)."""
    row = bucketed_exact_quantiles(adversarial, [], "v",
                                   [0.5]).collect()[0]
    want = adversarial.agg(
        F.expr("percentile(v, 0.5)").alias("q")).collect()[0]["q"]
    assert row["q0"] == want and row["n"] == 200


def test_default_value_bucket_is_monotone(spark):
    vals = sorted({(-1) ** i * (i ** 3) for i in range(60)}
                  | {0, 1, -1, 2**40, -(2**40)})
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r["b"] for r in
           df.select(default_value_bucket(F.col("v")).alias("b"),
                     "v").orderBy("v").collect()]
    assert got == sorted(got), got


def test_double_value_bucket_quantiles_match_percentile(spark):
    """The double-banded path (x3_ood_score's p95 over cosine
    distances): fixed-width floor(v*scale) bands, values in [0, 2]
    with heavy tie masses and irrational spreads — the staircase
    lookup must equal Spark's buffering percentile() BIT-exactly,
    interpolated fractions included."""
    from stock_data_warehouse_spark.operators.staircase import (
        double_value_bucket,
    )
    rows = [(i, ((i * i * 2654435761) % 997) / 498.5) for i in
            range(500)]                      # doubles in [0, 2]
    rows += [(1000 + i, 0.123456789) for i in range(37)]  # tie mass
    df = (spark.createDataFrame(rows, "id long, v double")
               .repartition(11).localCheckpoint())
    got = bucketed_exact_quantiles(
        df, [], "v", [0.5, 0.95],
        bucket=double_value_bucket(F.col("v"), 4096.0)).collect()[0]
    want = df.agg(F.expr("percentile(v, 0.5)").alias("q0"),
                  F.expr("percentile(v, 0.95)").alias("q1")
                  ).collect()[0]
    assert got["q0"] == want["q0"] and got["q1"] == want["q1"]
    assert got["n"] == 537


def test_level2_relation_is_n_over_b(adversarial):
    """The level-2 bound pin (VERDICT r8 item 3): for fixed-width
    id blocks of width B the bucket-dim relation holds exactly
    ceil(N/B) rows per group — the one staircase shape whose level-2
    size grows with N (staircase.py _offsets docstring states the
    single-task ceiling; this keeps the ratio honest so a silent
    block-width change surfaces)."""
    B = 16
    b = adversarial.withColumn("_b", F.floor(F.col("id") / B))
    lvl2 = b.groupBy("grp", "_b").agg(F.count(F.lit(1)).alias("_n"))
    per_grp = {r["grp"]: r["cnt"] for r in
               lvl2.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt"))
                   .collect()}
    n_ids = 200  # ids 0..199 interleave groups; blocks shared
    import math
    # every block of 16 consecutive ids contains both groups (g0 is
    # every 3rd id), so each group's level-2 size is the full
    # ceil(N/B) block count — the N/B law, not a coincidence of data
    assert per_grp["g0"] == per_grp["g1"] == math.ceil(n_ids / B)
