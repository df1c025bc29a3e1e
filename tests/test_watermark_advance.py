"""Pin Spark's multi-batch watermark semantics with crafted micro-data.

The t22_watermark_advance_drops oracle (streaming/jobs.py) replays
three engine behaviors that are NOT obvious from the docs and were
established by experiment on this exact Spark version:

1. the late-event filter of batch k uses the watermark operative in
   batch k-1 (one-batch lag: ``watermarkForLateEvents`` vs
   ``watermarkForEviction``), so a row arriving ONE batch late merges
   silently while a row TWO batches late drops;
2. the filter predicate is ``window.end <= frontier`` — equality DROPS
   (an evicted window cannot be reopened);
3. ``numRowsDroppedByWatermark`` counts rows at the STATEFUL operator,
   i.e. post-partial-aggregation group rows, not raw inputs.

If a Spark upgrade changes any of these, this file fails first and
points at the contract, instead of t22 failing as an opaque oracle
hash mismatch.
"""

import os
import shutil
from datetime import datetime

from pyspark.sql import functions as F


def _stage(spark, base, files):
    """Write each (name, rows, mtime) as one parquet file dir with a
    pinned modification time so the file-stream admission order is
    deterministic."""
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    for name, rows, mtime in files:
        df = spark.createDataFrame(
            [(i, t, 1.0) for i, t in rows],
            "event_id long, ts timestamp, v double")
        path = f"{base}/{name}"
        df.coalesce(1).write.parquet(path)
        for root, _dirs, fns in os.walk(path):
            for fn in fns:
                os.utime(os.path.join(root, fn), (mtime, mtime))
        os.utime(path, (mtime, mtime))


def test_two_watermark_semantics(spark, tmp_path):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    TS = lambda h, m: datetime(2024, 1, 1, h, m)
    base = str(tmp_path / "stage")
    # batch 0: 10:00, 12:10          -> wm after batch 0 = 12:00
    # batch 1: 10:05 (end 11:00; filter wm = epoch -> MERGES, lesson 1)
    #          12:20                 -> wm after batch 1 = 12:10
    # batch 2: filter wm = 12:00 (batch 1's operative wm, NOT 12:10)
    #   10:08 -> end 11:00 <= 12:00  -> drops
    #   11:45 -> end 12:00 == 12:00  -> drops (equality, lesson 2)
    #   12:40 -> end 13:00 >  12:00  -> kept
    # batch 3: 15:00 advances the frontier so [12,13) seals
    _stage(spark, base, [
        ("a", [(1, TS(10, 0)), (2, TS(12, 10))], 1_000_000),
        ("b", [(3, TS(10, 5)), (4, TS(12, 20))], 2_000_000),
        ("c", [(5, TS(10, 8)), (6, TS(11, 45)), (7, TS(12, 40))],
         3_000_000),
        ("d", [(8, TS(15, 0))], 4_000_000),
    ])
    s = (spark.readStream
         .schema("event_id long, ts timestamp, v double")
         .option("maxFilesPerTrigger", "1")
         .option("recursiveFileLookup", "true")
         .parquet(base))
    agg = (s.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n")))
    out = agg.select(F.col("w.start").alias("ws"), "n")
    q = (out.writeStream.format("memory").queryName("wm_semantics")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    got = {str(r["ws"]): r["n"]
           for r in spark.table("wm_semantics").collect()}
    # [10,11): rows 1 + 3 (the one-batch-late row MERGED); rows 5
    # dropped.  [11,12): row 6 dropped at the == boundary -> window
    # absent.  [12,13): rows 2, 4, 7.  [15,16): unsealed, withheld.
    assert got == {
        "2024-01-01 10:00:00": 2,
        "2024-01-01 12:00:00": 3,
    }, got
    dropped_per_batch = [
        sum(x["numRowsDroppedByWatermark"] for x in p["stateOperators"])
        for p in q.recentProgress]
    # rows 5 and 6 fall in DIFFERENT windows -> 2 group rows dropped,
    # all in batch 2 (lesson 3: the metric counts group rows; here
    # each dropped window has one row so groups == rows)
    assert sum(dropped_per_batch) == 2, dropped_per_batch
    assert dropped_per_batch[2] == 2, dropped_per_batch


def test_metric_counts_groups_not_rows(spark, tmp_path):
    """Two late rows in the SAME window drop as ONE metric row."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    TS = lambda h, m: datetime(2024, 1, 1, h, m)
    base = str(tmp_path / "stage")
    _stage(spark, base, [
        ("a", [(1, TS(10, 0)), (2, TS(12, 10))], 1_000_000),
        ("b", [(3, TS(12, 20))], 2_000_000),
        # batch 2, filter wm = 12:00: BOTH rows in [10,11) -> one group
        ("c", [(4, TS(10, 5)), (5, TS(10, 40)), (6, TS(12, 40))],
         3_000_000),
    ])
    s = (spark.readStream
         .schema("event_id long, ts timestamp, v double")
         .option("maxFilesPerTrigger", "1")
         .option("recursiveFileLookup", "true")
         .parquet(base))
    agg = (s.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.select(F.col("w.start").alias("ws"), "n")
         .writeStream.format("memory").queryName("wm_groups")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    total = sum(x["numRowsDroppedByWatermark"]
                for p in q.recentProgress
                for x in p["stateOperators"])
    assert total == 1, [
        (p["batchId"],
         [x["numRowsDroppedByWatermark"] for x in p["stateOperators"]])
        for p in q.recentProgress]


def test_dedup_within_watermark_semantics(spark, tmp_path):
    """Pin dropDuplicatesWithinWatermark's multi-batch behavior (the
    t25 oracle's contract): (1) a duplicate hitting live state is
    suppressed even when the key's expiry already passed the new frontier —
    dedup-matches run before eviction; (2) the late filter is the
    lagged equality-dropping raw-ts predicate and late rows count in
    numRowsDroppedByWatermark; (3) suppressed duplicates do NOT count
    there."""
    from datetime import datetime
    from pyspark.sql import functions as F
    TS = lambda h, m: datetime(2024, 1, 1, h, m)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = str(tmp_path / "stage")
    _stage(spark, base, [
        # delay 1h.  b0: A@10:00, M1@13:00 -> wm(b1) = 12:00
        ("a", [(1, TS(10, 0)), (100, TS(13, 0))], 1_000_000),
        # b1: A@10:00 dup — state expiry 11:00 < wm 12:00 but dedup
        # precedes eviction -> suppressed, NOT re-emitted, NOT in the
        # watermark-drop metric.  M2@14:00 -> wm(b2) = 13:00
        ("b", [(1, TS(10, 0)), (101, TS(14, 0))], 2_000_000),
        # b2: A@10:00 again — now 10:00 <= lagged wm 12:00 -> LATE drop
        # (counted).  B@12:30 fresh (> 12:00) -> emits.
        ("c", [(1, TS(10, 0)), (2, TS(12, 30))], 3_000_000),
    ])
    s = (spark.readStream
         .schema("event_id long, ts timestamp, v double")
         .option("maxFilesPerTrigger", "1")
         .option("recursiveFileLookup", "true")
         .parquet(base))
    q = (s.withWatermark("ts", "1 hour")
          .dropDuplicatesWithinWatermark(["event_id"])
          .writeStream.format("memory").queryName("dedup_semantics")
          .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted(r["event_id"]
                 for r in spark.table("dedup_semantics").collect())
    assert got == [1, 2, 100, 101], got       # each key exactly once
    drops = [sum(x["numRowsDroppedByWatermark"]
                 for x in p["stateOperators"])
             for p in q.recentProgress]
    assert sum(drops) == 1 and drops[2] == 1, drops


def test_join_frontier_null_strict_until_both_sides(spark, tmp_path):
    """One-sided prefix: purchases first appear in batch 2, so the
    global join frontier must stay at epoch through batches 0-1 (min
    of the two sides, NULL-strict — the t13 lesson under multi-batch
    admission). A click far below the click-side max therefore still
    matches when its purchase finally arrives; with a non-strict min
    it would have been late-dropped or evicted."""
    from datetime import datetime
    from pyspark.sql import functions as F
    TS = lambda h, m: datetime(2024, 1, 1, h, m)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = str(tmp_path / "stage")
    # v doubles as the join key: click 1 and purchase 100 share key 7
    _stage(spark, base, [
        # clicks only; click-side max races ahead to 18:00
        ("a", [(1, TS(10, 0)), (2, TS(18, 0))], 1_000_000),
        ("b", [(3, TS(18, 30))], 2_000_000),
        # first purchase ever: matches the 10:00 click — 8.5 hours
        # behind the click-side frontier, still admitted AND matched
        ("c", [(100, TS(10, 10)), (101, TS(19, 0))], 3_000_000),
    ])

    def src(tp):
        s = (spark.readStream
             .schema("event_id long, ts timestamp, v double")
             .option("maxFilesPerTrigger", "1")
             .option("recursiveFileLookup", "true")
             .parquet(base))
        return s.filter(F.col("event_id") < 100 if tp == "c"
                        else F.col("event_id") >= 100)

    key = F.when(F.col("event_id").isin(1, 100), 7).otherwise(
        F.col("event_id"))
    c = (src("c").withWatermark("ts", "30 minutes")
         .select(key.alias("ck"),
                 F.col("event_id").alias("click_id"),
                 F.col("ts").alias("c_ts")))
    p = (src("p").withWatermark("ts", "30 minutes")
         .select(key.alias("pk"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("p_ts")))
    j = c.join(p, (F.col("ck") == F.col("pk"))
               & (F.col("p_ts") >= F.col("c_ts"))
               & (F.col("p_ts") <= F.col("c_ts")
                  + F.expr("INTERVAL 30 MINUTES")))
    q = (j.writeStream.format("memory").queryName("null_strict")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = sorted((r["click_id"], r["purchase_id"])
                 for r in spark.table("null_strict").collect())
    assert got == [(1, 100)], got
    # and nothing was ever dropped: the frontier was epoch while every
    # row was admitted (purchases appeared only in the final file)
    drops = sum(x["numRowsDroppedByWatermark"]
                for pr in q.recentProgress
                for x in pr["stateOperators"])
    assert drops == 0, drops
