"""EP-2 refresh composition + external-source harness tests."""

import json
import os
import tempfile

from stock_data_warehouse_spark.pipeline import refresh_warehouse
from stock_data_warehouse_spark.sources.external import fetch_distributed


def test_refresh_warehouse_end_to_end_and_idempotent(spark):
    out = tempfile.mkdtemp()
    r1 = refresh_warehouse(spark, out)
    # fixture census: 3 lists, 9 unique tickers, 7 published,
    # FFF (no data) + III (no price) skipped
    assert (r1["lists"], r1["unique_tickers"]) == (3, 9)
    assert (r1["published"], r1["skipped"]) == (7, 2)
    assert r1["changed"] == 7

    # serving artifacts: one JSON per ticker + nested manifest
    files = sorted(os.listdir(os.path.join(out, "json")))
    assert files == [f"{t}.json" for t in
                     ("AAA", "BBB", "CC-C", "DDD", "EEE", "GGG", "HHH")]
    with open(os.path.join(out, "_manifest.json")) as f:
        doc = json.load(f)
    assert doc["lists"]["income"] == ["GGG", "HHH", "GGG", "III"]

    # second run: unchanged → publishes nothing (OP-T2 idempotence)
    r2 = refresh_warehouse(spark, out)
    assert r2["changed"] == 0 and r2["published"] == 7


def test_fetch_distributed_retry_and_skip(spark):
    df = spark.createDataFrame(
        [("AAPL",), ("BRR",), ("ZZZ",)], "ticker string").coalesce(1)
    rows = {r["ticker"]: r for r in fetch_distributed(df).collect()}
    assert rows["AAPL"]["ok"] and rows["AAPL"]["attempts"] == 1
    # transient first attempt → retry-once succeeds (OP-E2)
    assert rows["BRR"]["ok"] and rows["BRR"]["attempts"] == 2
    # permanent failure → skip-on-failure row, job survives (OP-E1)
    assert not rows["ZZZ"]["ok"] and rows["ZZZ"]["price"] is None
