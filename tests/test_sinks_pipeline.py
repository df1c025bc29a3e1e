"""Sink round-trips + reference-pipeline golden rows (SURVEY.md §5.3-5.4)."""

import json
import os
import tempfile

import pytest

from pyspark.sql import functions as F

from stock_data_warehouse_spark.sources.sinks import (
    manifest_doc, publish_if_changed, swap_in, write_per_key_json,
)


def test_per_key_json_exact_naming(spark):
    df = spark.createDataFrame(
        [("AAPL", 1.0), ("BRK-B", 2.0)], "ticker string, v double")
    out = tempfile.mkdtemp()
    write_per_key_json(df, "ticker", out)
    assert sorted(os.listdir(out)) == ["AAPL.json", "BRK-B.json"]
    with open(os.path.join(out, "BRK-B.json")) as f:
        assert json.load(f) == {"ticker": "BRK-B", "v": 2.0}


def test_manifest_preserves_order_and_duplicates(spark):
    rows = [("hot", 0, "ORCL"), ("hot", 1, "NFLX"), ("hot", 2, "ORCL"),
            ("dow", 0, "MMM")]
    df = spark.createDataFrame(
        rows, "list_name string, position int, ticker string")
    doc = json.loads(manifest_doc(df))
    assert doc["lists"]["hot"] == ["ORCL", "NFLX", "ORCL"]  # dup kept
    assert doc["lists"]["dow"] == ["MMM"]
    assert "last_updated" in doc


def test_publish_if_changed_idempotent(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    target = tempfile.mkdtemp()
    assert publish_if_changed(spark, df, target, "k") == 2
    assert publish_if_changed(spark, df, target, "k") == 0
    df2 = spark.createDataFrame([(1, "a"), (2, "CHANGED")],
                                "k int, v string")
    assert publish_if_changed(spark, df2, target, "k") == 1


def test_swap_in_crash_window(spark, monkeypatch):
    """VERDICT r6 item 1: a crash at ANY step of the staged swap must
    leave the table readable at ``path`` or ``path + '.old'`` — never a
    window with the table deleted and the rewrite stranded in staging.
    Fault-inject by killing the k-th os.rename call, then check the
    invariant and that re-running the swap from the surviving state
    still converges."""
    df_old = spark.createDataFrame([(1, "old")], "k int, v string")
    df_new = spark.createDataFrame([(2, "new")], "k int, v string")

    def readable_somewhere(path):
        for p in (path, path + ".old"):
            if os.path.exists(p):
                rows = spark.read.parquet(p).collect()
                if rows:
                    return True
        return False

    real_rename = os.rename
    for kill_at in (0, 1, 2):  # before 1st rename, between, after both
        base = tempfile.mkdtemp()
        table = os.path.join(base, "t")
        staging = os.path.join(base, "t.staging")
        df_old.write.parquet(table)
        df_new.write.parquet(staging)

        calls = {"n": 0}

        def crashing_rename(src, dst):
            if calls["n"] == kill_at:
                raise OSError("injected crash")
            calls["n"] += 1
            real_rename(src, dst)

        monkeypatch.setattr(os, "rename", crashing_rename)
        try:
            swap_in(staging, table)
        except OSError:
            pass
        monkeypatch.setattr(os, "rename", real_rename)
        assert readable_somewhere(table), f"table lost at kill_at={kill_at}"

        # recovery: restore old aside if the table path is vacant, then
        # redo the swap — must converge to the new content
        if not os.path.exists(table) and os.path.exists(table + ".old"):
            os.rename(table + ".old", table)
        if os.path.exists(staging):
            swap_in(staging, table)
        vals = {r["v"] for r in spark.read.parquet(table).collect()}
        assert vals in ({"new"}, {"old"})  # one consistent snapshot


@pytest.fixture(scope="module")
def snapshot(spark):
    from stock_data_warehouse_spark.plans.reference_pipeline import (
        snapshot_pipeline,
    )
    return {r["ticker"]: r.asDict() for r in snapshot_pipeline(spark).collect()}


def test_pipeline_survivors(snapshot):
    # FFF has no instrument data; III has no valid price → both skipped
    assert sorted(snapshot) == [
        "AAA", "BBB", "CC-C", "DDD", "EEE", "GGG", "HHH"]


def test_pipeline_golden_aaa(snapshot):
    r = snapshot["AAA"]
    assert r["price"] == 100.0
    assert r["revenue_ttm"] == 1000.0
    assert r["capex_ttm"] == 120.0          # abs of -120
    assert r["cash_and_equivalents"] == 400.0
    assert r["analyst_growth_estimate"] == 10.0
    assert r["sector_type"] == "General"


def test_pipeline_golden_bbb_fx_and_truthiness(snapshot):
    r = snapshot["BBB"]
    # negative currentPrice stopped the or-chain → history close 44.5
    assert r["price"] == 44.5
    # 5-quarter cut: old 999 excluded; EUR 0.8 division
    assert r["revenue_ttm"] == 1250.0
    assert r["cash_and_equivalents"] == 150.0  # (80 + 40) / 0.8
    assert r["beta"] == 1.2                    # <0.5 growth-sector floor
    assert r["sector_type"] == "SaaS"


def test_pipeline_golden_ccc_megacap(snapshot):
    r = snapshot["CC-C"]
    assert r["sector_type"] == "Semiconductor"  # beats Software
    assert r["analyst_growth_estimate"] == 30.0  # megacap cap
    assert r["beta"] == 1.35                     # $1T tier
    assert r["net_income_ttm"] == 600.0          # 3rd-priority alias
    assert r["cash_and_equivalents"] == 6000.0


def test_pipeline_golden_ddd_defaults(snapshot):
    r = snapshot["DDD"]
    assert r["price"] == 42.0                # history fallback
    assert r["revenue_ttm"] == 0.0           # no statements
    assert r["book_value_ttm"] == 6000000.0  # bookValue × shares
    assert r["beta"] == 1.0
    assert r["analyst_growth_estimate"] == 3.0
    assert r["roe"] == 0.0


def test_pipeline_golden_eee_guards(snapshot):
    r = snapshot["EEE"]
    assert r["revenue_ttm"] == 100.0             # 2-quarter partial TTM
    assert r["cash_and_equivalents"] == 350.0    # -500 STI skipped
    assert r["beta"] == 2.5
    assert r["analyst_growth_estimate"] == -5.0  # within BioTech min
    assert r["roe"] == -10.0


def test_pipeline_golden_quirks(snapshot):
    assert snapshot["GGG"]["dividend_yield"] == 709.0  # double-scaling
    assert snapshot["GGG"]["sector_type"] == "REIT"
    h = snapshot["HHH"]
    assert h["sector_type"] == "Hardware"
    assert h["analyst_growth_estimate"] == 20.0  # General cfg fallback
    assert h["beta"] == 1.6                      # $200B tier
    assert h["net_income_ttm"] == 165.0          # null quarter → 0


def test_sharded_export_files_match_manifest(spark, tmp_path):
    """Every sampled doc lands in exactly one shard file; file line
    counts equal the manifest; re-export is byte-stable."""
    import json
    import os

    from pyspark.sql import functions as F

    from stock_data_warehouse_spark.plans.sampling import (
        _UNIFORM_TH, hash_coin,
    )
    from stock_data_warehouse_spark.sources.sinks import (
        write_sharded_jsonl,
    )
    from stock_data_warehouse_spark.sources.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    shard = (F.ascii(F.substring(
        F.md5(F.concat(F.lit("shard:"),
                       F.col("doc_id").cast("string"))), 1, 1)) % 8)
    mix = (d.filter(hash_coin(F.col("doc_id"), "u") < _UNIFORM_TH)
            .select("doc_id", "lang", shard.alias("shard")))
    out1, out2 = str(tmp_path / "e1"), str(tmp_path / "e2")
    write_sharded_jsonl(mix, "shard", out1)
    write_sharded_jsonl(mix, "shard", out2)

    manifest = {r["shard"]: r["count"]
                for r in mix.groupBy("shard").count().collect()}
    for sh, n in manifest.items():
        p1 = os.path.join(out1, f"shard-{sh}.jsonl")
        lines1 = sorted(open(p1).read().splitlines())
        assert len(lines1) == n
        lines2 = sorted(open(
            os.path.join(out2, f"shard-{sh}.jsonl")).read().splitlines())
        assert lines1 == lines2  # deterministic re-export
        assert all("doc_id" in json.loads(l) for l in lines1[:3])


def test_versioned_publish_mints_only_on_change(spark, tmp_path):
    """v1 then changed v2 then identical republish: exactly two version
    partitions exist, read-as-of returns each snapshot, latest = v2."""
    import os
    from pyspark.sql import functions as F
    from stock_data_warehouse_spark.sources.sinks import (
        publish_versioned, read_version,
    )
    df1 = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("val"))
    df2 = df1.withColumn(
        "val", F.when(F.col("k") == 2, 999).otherwise(F.col("val")))
    target = str(tmp_path / "versions")
    assert publish_versioned(spark, df1, target) == (1, True)
    assert publish_versioned(spark, df1, target) == (1, False)  # no-op
    assert publish_versioned(spark, df2, target) == (2, True)
    assert publish_versioned(spark, df2, target) == (2, False)  # no-op
    assert sorted(d for d in os.listdir(target)
                  if d.startswith("v=")) == ["v=1", "v=2"]
    v1 = {(r["k"], r["val"]) for r in read_version(spark, target, 1).collect()}
    latest = {(r["k"], r["val"])
              for r in read_version(spark, target).collect()}
    assert (2, 20) in v1 and (2, 999) in latest
    assert len(v1) == len(latest) == 5


def test_versioned_publish_detects_duplicate_multiplicity(spark, tmp_path):
    """A snapshot differing only in duplicate row count must mint a new
    version (hash-set comparison alone would call it unchanged)."""
    from pyspark.sql import functions as F
    from stock_data_warehouse_spark.sources.sinks import publish_versioned
    df1 = spark.range(3).select(F.col("id").alias("k"))
    df_dup = df1.union(df1.filter(F.col("k") == 1))  # same set, 4 rows
    target = str(tmp_path / "versions_dup")
    assert publish_versioned(spark, df1, target) == (1, True)
    assert publish_versioned(spark, df_dup, target) == (2, True)
    assert publish_versioned(spark, df_dup, target) == (2, False)


def test_zorder_groups_are_tight_rectangles(spark):
    """Each z-range file group must cover at most a 64x64 rectangle of
    the 256x256 (customer x date) bucket grid — the property that makes
    min/max footer pruning effective on BOTH dimensions. A linear
    (single-dim) sort would leave one dimension spanning the full 256."""
    from stock_data_warehouse_spark.sources.sinks import s16_zorder_layout
    rows = s16_zorder_layout(spark, "/root/testdata/sf0.001").collect()
    assert 1 <= len(rows) <= 16
    total = sum(r["n_rows"] for r in rows)
    assert total > 0
    for r in rows:
        w = r["max_cust_bucket"] - r["min_cust_bucket"] + 1
        h = r["max_day_bucket"] - r["min_day_bucket"] + 1
        assert w <= 64 and h <= 64, (r["group_id"], w, h)
