"""Sampling / training-mix pack (OP-X7) + the round's new relational ops.

Properties, not goldens: determinism across evaluations, stratum rates
in tolerance, copy-count semantics of the fractional epoch mix, full
redaction in the PII scrub.
"""

import pytest
from pyspark.sql import functions as F

from stock_data_warehouse_spark.plans import sampling as S

SF = "/root/testdata/sf0.001"


def test_hex_threshold_monotone_and_total():
    assert S._hex_threshold(0.0) == "000000"
    assert S._hex_threshold(0.25) < S._hex_threshold(0.5) \
        < S._hex_threshold(0.9)
    # rate 1.0 must keep EVERY coin: "g" sorts above any hex string
    assert S._hex_threshold(1.0) == "g"
    assert "ffffff" < S._hex_threshold(1.0)


def test_split_assignment_matches_config():
    names = [n for n, _ in S._SPLITS]
    assert names == ["train", "valid", "test"]


def test_hash_sample_deterministic_and_in_rate(spark):
    a = S.x7_hash_sample(spark, SF)
    n_total = spark.read.parquet(f"{SF}/documents.parquet").count()
    n1, n2 = a.count(), S.x7_hash_sample(spark, SF).count()
    assert n1 == n2  # same result on re-evaluation
    # 25% target; binomial tolerance on a small corpus
    assert 0.10 <= n1 / n_total <= 0.40


def test_stratified_rates_ordered(spark):
    kept = (S.x7_stratified_mix(spark, SF)
            .groupBy("lang").count().collect())
    total = (spark.read.parquet(f"{SF}/documents.parquet")
             .groupBy("lang").count().collect())
    tot = {r["lang"]: r["count"] for r in total}
    rate = {r["lang"]: r["count"] / tot[r["lang"]] for r in kept}
    # en keeps the most; es the least of the configured strata
    assert rate.get("en", 0) > rate.get("es", 1e-9) or tot.get("es", 0) < 5


def test_weighted_epoch_mix_copy_counts(spark):
    out = S.x7_weighted_epoch_mix(spark, SF)
    per_doc = out.groupBy("doc_id", "source", "n_copies").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.max("epoch").alias("max_epoch"))
    bad = per_doc.filter(
        (F.col("n_rows") != F.col("n_copies"))
        | (F.col("max_epoch") != F.col("n_copies"))).count()
    assert bad == 0
    # weight 2.5 sources emit 2 or 3 copies; weight 0.5 emit 0 or 1
    rng = (out.filter(F.col("source") == "src0")
              .select("n_copies").distinct().collect())
    assert {r["n_copies"] for r in rng} <= {2, 3}


def test_split_assignment_total_and_stable(spark):
    out = S.x7_split_assignment(spark, SF)
    n = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert out.count() == n  # a split for every doc, none dropped
    counts = {r["split"]: r["count"]
              for r in out.groupBy("split").count().collect()}
    assert counts.get("train", 0) > counts.get("valid", 0)
    assert counts.get("train", 0) > counts.get("test", 0)


def test_pii_scrub_redacts_everything(spark):
    from stock_data_warehouse_spark.plans import extensions as X
    out = X.x4_pii_scrub(spark, SF)
    leaked = out.filter(
        F.col("scrubbed").rlike("[a-z0-9]+@[a-z0-9]+\\.[a-z]+")
        | F.col("scrubbed").rlike("[0-9]{4,}")).count()
    assert leaked == 0
    none_found = out.filter(
        (F.col("n_emails") < 1) | (F.col("n_longnums") < 1)).count()
    assert none_found == 0  # the injected contact line is always caught


def test_quantile_pack_bounds(spark):
    from stock_data_warehouse_spark.plans import relational as R
    rows = R.a10_quantile_pack(spark, SF).collect()
    assert rows
    for r in rows:
        assert (r["min_qty"] <= r["p25_qty"] <= r["p50_qty"]
                <= r["p75_qty"] <= r["max_qty"])


def test_grouping_sets_has_three_levels(spark):
    from stock_data_warehouse_spark.plans import relational as R
    out = R.a8_grouping_sets(spark, SF)
    levels = {(r["g_region"], r["g_nation"])
              for r in out.select("g_region", "g_nation")
                          .distinct().collect()}
    assert levels == {(0, 0), (0, 1), (1, 1)}  # detail, region, grand


def test_range_frame_counts_at_least_self(spark):
    from stock_data_warehouse_spark.plans import windows as W
    out = W.w5_range_frame_events(spark, SF)
    assert out.filter(F.col("n_trailing_1h") < 1).count() == 0


def test_q9_profit_star_covers_all_nations(spark):
    from stock_data_warehouse_spark.plans import relational as R
    rows = R.q9_profit_by_nation_year(spark, SF).collect()
    assert rows
    nations = {r["nation"] for r in rows}
    assert len(nations) >= 5  # the join tree reaches the nation dim
    assert all(r["n_items"] > 0 for r in rows)


def test_histogram_partitions_every_row(spark):
    from pyspark.sql import functions as F
    from stock_data_warehouse_spark.plans import relational as R
    out = R.a11_price_histogram(spark, SF)
    total = out.agg(F.sum("n_items")).collect()[0][0]
    n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    assert total == n
    bad = out.filter((F.col("bucket") < 0) | (F.col("bucket") > 23)
                     | (F.col("lo") > F.col("hi"))).count()
    assert bad == 0


def test_salted_join_equals_plain_join(spark):
    from pyspark.sql import functions as F
    from stock_data_warehouse_spark.operators.skew import salted_join
    from stock_data_warehouse_spark.sources.tables import (
        load_table, values_df,
    )
    li = (load_table(spark, SF, "lineitem")
          .withColumnRenamed("l_returnflag", "line_item"))
    dim = values_df(spark, [("R", 1), ("A", 2), ("N", 3)],
                    "line_item string, code int")
    salted = (salted_join(li, dim, "line_item", "l_linenumber")
              .groupBy("line_item", "code")
              .agg(F.count(F.lit(1)).alias("n")))
    plain = (li.join(dim, "line_item")
             .groupBy("line_item", "code")
             .agg(F.count(F.lit(1)).alias("n")))
    assert sorted(map(tuple, salted.collect())) \
        == sorted(map(tuple, plain.collect()))


def test_bpe_tokens_reconstruct_length(spark):
    """The pre-tokenizer partitions the lowered text minus unmatched
    separators: token count is positive and space-led tokens are a
    subset of all tokens."""
    from pyspark.sql import functions as F
    from stock_data_warehouse_spark.plans import extensions as X
    out = X.x4_bpe_token_count(spark, SF)
    bad = out.filter((F.col("n_bpe_tokens") <= 0)
                     | (F.col("n_space_led") > F.col("n_bpe_tokens"))
                     | (F.col("n_distinct") > F.col("n_bpe_tokens"))
                     ).count()
    assert bad == 0


def test_weighted_sample_ares_skews_to_weight_and_plans_takeordered(spark):
    """The A-Res sample must (1) actually be weight-biased — mean
    n_chars of the selected 100 well above the corpus mean, (2) plan as
    TakeOrderedAndProject (no global sort), (3) be deterministic."""
    df = S.x7_weighted_sample_ares(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    assert len(rows) == S._ARES_K
    sample_mean = sum(r["n_chars"] for r in rows) / len(rows)
    corpus = S._t(spark, SF, "documents").agg(
        F.avg("n_chars").alias("m")).collect()[0]["m"]
    assert sample_mean > corpus * 1.1
    again = S.x7_weighted_sample_ares(spark, SF).collect()
    assert [r["doc_id"] for r in again] == [r["doc_id"] for r in rows]
