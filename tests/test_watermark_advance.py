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



def _stage_keyed(spark, base, files):
    """Like _stage but rows are (event_id, ts, key) with v = the key."""
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base)
    for name, rows, mtime in files:
        df = spark.createDataFrame(
            [(i, t, float(k)) for i, t, k in rows],
            "event_id long, ts timestamp, v double")
        path = f"{base}/{name}"
        df.coalesce(1).write.parquet(path)
        for root, _dirs, fns in os.walk(path):
            for fn in fns:
                os.utime(os.path.join(root, fn), (mtime, mtime))
        os.utime(path, (mtime, mtime))


def _run_session(spark, base, qname):
    s = (spark.readStream
         .schema("event_id long, ts timestamp, v double")
         .option("maxFilesPerTrigger", "1")
         .option("recursiveFileLookup", "true")
         .parquet(base))
    agg = (s.withWatermark("ts", "10 minutes")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                     "v")
            .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.select(F.col("w.start").alias("ws"),
                    F.col("w.end").alias("we"), "v", "n")
         .writeStream.format("memory").queryName(qname)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = sorted((str(r["ws"]), str(r["we"]), r["v"], r["n"])
                  for r in spark.table(qname).collect())
    prog = [(p["batchId"],
             sum(x["numRowsDroppedByWatermark"]
                 for x in p["stateOperators"]),
             p["sink"]["numOutputRows"]) for p in q.recentProgress]
    return rows, prog


def test_session_window_semantics(spark, tmp_path):
    """Pin the session-window streaming semantics the t26 oracle
    replays (gap 30m, delay 10m; v is the session key):

    1. an admitted one-batch-late row MERGES into live session state
       and can BRIDGE two open sessions (state merge — the behavior
       unique to sessions);
    2. the late filter is the lagged frontier applied to the row's
       INITIAL window end (ts + gap), equality drops — a row whose raw
       ts is behind the frontier but whose window end is ahead is
       still admitted;
    3. numRowsDroppedByWatermark counts RAW rows (two same-session
       late rows count 2 — no partial aggregate precedes the session
       operator, unlike the t22 windowed agg whose metric counts
       group rows);
    4. sessions merge ON TOUCH (an event exactly gap after the
       previous one extends the session);
    5. a session seals once end <= the CURRENT frontier — equality
       SEALS (emits in that same batch, not the next).
    """
    from datetime import datetime
    TS = lambda h, m: datetime(2024, 1, 1, h, m)
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    # --- lessons 1, 2, 4: merge/bridge, window-end filter, touch
    _stage_keyed(spark, str(tmp_path / "s1"), [
        # b0: {10:00,10:20} one session; 12:00 another -> wm(b1)=11:50
        ("a", [(1, TS(10, 0), 1), (2, TS(10, 20), 1),
               (3, TS(12, 0), 1)], 1_000_000),
        # b1 (filter=epoch): 10:40 merges -> [10:00,11:10) seals at
        # eviction 11:50; 12:30 TOUCHES [12:00,12:30) -> extends (4)
        ("b", [(4, TS(10, 40), 1), (5, TS(12, 30), 1)], 2_000_000),
        # b2 (filter=11:50): 10:30 end 11:00 <= 11:50 -> drop;
        # 11:35 end 12:05 > 11:50 -> ADMITTED though raw ts < frontier
        # (2), and BRIDGES into [12:00,13:00) -> [11:35,13:00) n=3 (1);
        # 13:30 advances the final frontier to 13:20 so it seals
        ("c", [(6, TS(10, 30), 1), (7, TS(11, 35), 1),
               (8, TS(13, 30), 1)], 3_000_000),
    ])
    rows, _ = _run_session(spark, str(tmp_path / "s1"), "sess_sem1")
    assert rows == [
        ("2024-01-01 10:00:00", "2024-01-01 11:10:00", 1.0, 3),
        ("2024-01-01 11:35:00", "2024-01-01 13:00:00", 1.0, 3),
    ], rows

    # --- lessons 3, 5: raw-row metric, filter-equality drop,
    # seal-equality emission
    _stage_keyed(spark, str(tmp_path / "s2"), [
        ("a", [(1, TS(12, 0), 9)], 1_000_000),   # wm(b1) = 11:50
        ("b", [(2, TS(14, 0), 9)], 2_000_000),   # wm(b2) = 13:50
        # b2: filter frontier 11:50, eviction frontier 13:50
        #   k1: 10:00 + 10:10 both late, SAME would-be session -> the
        #       metric counts 2 raw rows, not 1 merged partial (3)
        #   k2: end 11:50 == filter frontier -> equality DROPS
        #   k3: end 13:50 == eviction frontier -> seals IN b2 (5)
        #   k9: 14:30 keeps the final session open (end 15:00 > 14:20)
        ("c", [(3, TS(10, 0), 1), (4, TS(10, 10), 1),
               (5, TS(11, 20), 2), (6, TS(13, 20), 3),
               (7, TS(14, 30), 9)], 3_000_000),
    ])
    rows, prog = _run_session(spark, str(tmp_path / "s2"), "sess_sem2")
    assert rows == [
        ("2024-01-01 12:00:00", "2024-01-01 12:30:00", 9.0, 1),
        ("2024-01-01 13:20:00", "2024-01-01 13:50:00", 3.0, 1),
    ], rows
    by_batch = {b: (d, o) for b, d, o in prog}
    assert by_batch[2][0] == 3, prog          # 2 raw k1 rows + k2
    assert by_batch[2][1] == 2, prog          # k9 [12:00,12:30) + k3
                                              # sealed IN batch 2


def test_session_reopen_after_seal(spark, tmp_path):
    """Pin the SPLIT-SESSION hazard the t26 staging constructs away:
    an ADMITTED late row whose initial window overlaps an already-
    SEALED same-key session re-opens nothing — the engine emits a
    second, overlapping session row. A global gaps-and-islands model
    would have produced ONE merged session, which is why t26's
    late-shift subset excludes kept rows with a same-key predecessor
    within the merge window (they could land next to a sealed
    session); if a Spark upgrade ever changes this to re-open or
    retract, this pin fails first."""
    from datetime import datetime
    TS = lambda h, m: datetime(2024, 1, 1, h, m)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    _stage_keyed(spark, str(tmp_path / "s3"), [
        # b0: k1@10:00; k9@10:45 -> wm(b1) = 10:35
        ("a", [(1, TS(10, 0), 1), (2, TS(10, 45), 9)], 1_000_000),
        # b1: eviction 10:35 seals k1 [10:00,10:30); -> wm(b2) = 11:20
        ("b", [(3, TS(11, 30), 9)], 2_000_000),
        # b2: k1@10:15 — filter frontier (lagged) = 10:35; end 10:45 >
        # 10:35 -> ADMITTED; ts 10:15 < sealed end 10:30 -> overlaps
        # the emitted session. 13:00 seals everything left (wm 12:50).
        ("c", [(4, TS(10, 15), 1), (5, TS(13, 0), 9)], 3_000_000),
    ])
    rows, prog = _run_session(spark, str(tmp_path / "s3"), "sess_sem3")
    assert rows == [
        ("2024-01-01 10:00:00", "2024-01-01 10:30:00", 1.0, 1),
        ("2024-01-01 10:15:00", "2024-01-01 10:45:00", 1.0, 1),  # split!
        ("2024-01-01 10:45:00", "2024-01-01 11:15:00", 9.0, 1),
        ("2024-01-01 11:30:00", "2024-01-01 12:00:00", 9.0, 1),
    ], rows
    assert sum(d for _b, d, _o in prog) == 0, prog  # admitted, not late


def test_custom_state_timeout_semantics(spark, tmp_path):
    """Pin the applyInPandasWithState + EventTimeTimeout behaviors the
    t27 oracle replays (gap 30m, delay 10m, v is the key):

    1. the late filter is the LAGGED raw-ts equality-dropping
       predicate (joins/dedup rule — no window struct in the key) and
       numRowsDroppedByWatermark counts raw rows;
    2. a pending event-time timeout fires at the first batch whose
       CURRENT watermark passes it and the group got no data;
    3. firing is STRICT: timeoutTimestamp == watermark does NOT fire;
    4. the AvailableNow final no-data batch runs only when the last
       data batch advanced the watermark — so state whose mark is not
       strictly below the final frontier is simply still open when
       the stream ends.
    """
    from datetime import datetime
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )
    TS = lambda h, m: datetime(2024, 1, 1, h, m)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    GAP_US = 1_800_000_000

    out_schema = "k double, s_us long, e_us long, n long, by string"
    state_schema = "s long, e long, n long"

    def sessionize(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            s_, e_, n_ = state.get
            state.remove()
            yield pd.DataFrame({"k": [key[0]], "s_us": [s_],
                                "e_us": [e_], "n": [n_],
                                "by": ["timeout"]})
            return
        items = [list(state.get)] if state.exists else []
        for pdf in pdfs:
            if len(pdf):
                us = pdf["ts"].to_numpy(dtype="datetime64[us]") \
                              .astype("int64")
                items.extend([int(u), int(u), 1] for u in us)
        if not items:
            return
        items.sort()
        merged = [items[0]]
        for it in items[1:]:
            if it[0] - merged[-1][1] <= GAP_US:
                merged[-1][1] = max(merged[-1][1], it[1])
                merged[-1][2] += it[2]
            else:
                merged.append(it)
        closed, keep = merged[:-1], merged[-1]
        state.update(tuple(keep))
        t_ms = (keep[1] + GAP_US) // 1000
        state.setTimeoutTimestamp(
            max(t_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield pd.DataFrame(
                {"k": [key[0]] * len(closed),
                 "s_us": [i[0] for i in closed],
                 "e_us": [i[1] for i in closed],
                 "n": [i[2] for i in closed],
                 "by": ["data"] * len(closed)})

    def run(base, qname):
        s = (spark.readStream
             .schema("event_id long, ts timestamp, v double")
             .option("maxFilesPerTrigger", "1")
             .option("recursiveFileLookup", "true")
             .parquet(base))
        st = (s.withWatermark("ts", "10 minutes")
               .groupBy("v")
               .applyInPandasWithState(
                   sessionize, out_schema, state_schema,
                   "append", GroupStateTimeout.EventTimeTimeout))
        q = (st.writeStream.format("memory").queryName(qname)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        rows = sorted((r["k"],
                       datetime.utcfromtimestamp(r["s_us"] / 1e6)
                       .strftime("%H:%M"), r["n"], r["by"])
                      for r in spark.table(qname).collect())
        drops = [sum(x["numRowsDroppedByWatermark"]
                     for x in p["stateOperators"])
                 for p in q.recentProgress]
        return rows, drops

    # scenario A: lagged raw-ts filter + mid-stream timeout firing
    _stage_keyed(spark, str(tmp_path / "c1"), [
        # b0: k1 {10:00,10:10}; k2 {10:05}; k9 12:00 -> wm(b1)=11:50
        ("a", [(1, TS(10, 0), 1), (2, TS(10, 10), 1),
               (3, TS(10, 5), 2), (4, TS(12, 0), 9)], 1_000_000),
        # b1: k1 11:30 closes its session BY DATA; k9 14:00 ->
        # wm(b2)=13:50; k2's 10:35 mark < 11:50 -> fires BY TIMEOUT
        ("b", [(5, TS(11, 30), 1), (6, TS(14, 0), 9)], 2_000_000),
        # b2: lagged filter = 11:50 (NOT the operative 13:50):
        # k4@11:50 drops on equality, k7@10:30 drops, k6@11:55 kept
        ("c", [(7, TS(11, 50), 4), (8, TS(11, 55), 6),
               (9, TS(10, 30), 7)], 3_000_000),
    ])
    rows, drops = run(str(tmp_path / "c1"), "cst1")
    assert (1.0, "10:00", 2, "data") in rows, rows       # closed by data
    assert (2.0, "10:05", 1, "timeout") in rows, rows    # fired mid-stream
    assert (1.0, "11:30", 1, "timeout") in rows, rows    # fired at b2
    assert sum(drops) == 2 and drops[2] == 2, drops      # raw rows, lagged

    # scenario B: STRICT firing — T == final watermark stays open
    _stage_keyed(spark, str(tmp_path / "c2"), [
        ("a", [(1, TS(12, 0), 9)], 1_000_000),
        ("b", [(2, TS(14, 0), 9)], 2_000_000),
        # k8's mark = 14:20 + 30m = 14:50:00.000 == final wm (15:00-10m)
        ("c", [(3, TS(14, 20), 8), (4, TS(15, 0), 9)], 3_000_000),
    ])
    rows, _ = run(str(tmp_path / "c2"), "cst2")
    assert not any(r[0] == 8.0 for r in rows), rows      # still open
    assert (9.0, "12:00", 1, "data") in rows, rows
    assert (9.0, "14:00", 1, "data") in rows, rows


def test_sliding_window_partial_drops(spark, tmp_path):
    """Pin the sliding-window late semantics the t28 oracle replays
    (window 1h / slide 30m here, delay 10m): the late filter applies
    per EXPANDED (event, window) row — one late event's older window
    drops (end <= lagged frontier) while its newer window still
    merges — and the drop metric counts post-partial-agg GROUP rows
    (two late events sharing a dropped window count once, the t22
    counting)."""
    from datetime import datetime
    TS = lambda h, m: datetime(2024, 1, 1, h, m)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    base = str(tmp_path / "sl")
    _stage(spark, base, [
        ("a", [(1, TS(10, 0)), (2, TS(12, 0))], 1_000_000),  # wm->11:50
        ("b", [(3, TS(12, 40))], 2_000_000),                 # wm->12:30
        # b2 (lagged filter 11:50): 11:10 and 11:15 both lose
        # [10:30,11:30) (end 11:30 <= 11:50) but land in [11:00,12:00)
        ("c", [(4, TS(11, 10)), (5, TS(11, 15)), (6, TS(14, 0))],
         3_000_000),
    ])
    s = (spark.readStream
         .schema("event_id long, ts timestamp, v double")
         .option("maxFilesPerTrigger", "1")
         .option("recursiveFileLookup", "true")
         .parquet(base))
    agg = (s.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n")))
    q = (agg.select(F.col("w.start").alias("ws"), "n")
         .writeStream.format("memory").queryName("slide_sem")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {str(r["ws"]): r["n"]
           for r in spark.table("slide_sem").collect()}
    assert got.get("2024-01-01 11:00:00") == 2, got  # newer window kept
    assert "2024-01-01 10:30:00" not in got, got     # older window gone
    drops = [sum(x["numRowsDroppedByWatermark"]
                 for x in p["stateOperators"])
             for p in q.recentProgress]
    assert sum(drops) == 1 and drops[2] == 1, drops  # one GROUP row


def test_chained_join_agg_frontier(spark, tmp_path):
    """Pin the chained-stateful watermark propagation the t29 oracle
    relies on: a windowed agg DOWNSTREAM of a stream-stream interval
    join seals against the global watermark DELAYED by the join's
    event-time interval (30 min), and the comparison is STRICT — a
    window ending exactly at wm − 30 min is withheld (the opposite
    equality behavior of the unchained t7/t22 agg). Probed at the
    exact millisecond boundary: wm − 30 min == window end → withheld;
    one millisecond past → sealed. Also: no drops at either operator
    (the composition theorem — the join's lagged input filter is the
    only loss mechanism in the chain)."""
    from datetime import datetime

    def stage_typed(base, files):
        shutil.rmtree(base, ignore_errors=True)
        os.makedirs(base)
        for name, rows, mtime in files:
            df = spark.createDataFrame(
                [(i, t, float(k), tp) for i, t, k, tp in rows],
                "event_id long, ts timestamp, v double, tp string")
            path = f"{base}/{name}"
            df.coalesce(1).write.parquet(path)
            for root, _dirs, fns in os.walk(path):
                for fn in fns:
                    os.utime(os.path.join(root, fn), (mtime, mtime))
            os.utime(path, (mtime, mtime))

    def run(tag, top):
        base = str(tmp_path / f"ch{tag}")
        TS = lambda h, m: datetime(2024, 1, 1, h, m)
        stage_typed(base, [
            ("a", [(1, TS(10, 0), 1, "c"), (2, TS(10, 1), 1, "p")],
             1_000_000),
            ("b", [(3, top, 9, "c"), (4, top, 9, "p")], 2_000_000),
        ])

        def src(tp):
            s = (spark.readStream
                 .schema("event_id long, ts timestamp, "
                         "v double, tp string")
                 .option("maxFilesPerTrigger", "1")
                 .option("recursiveFileLookup", "true")
                 .parquet(base))
            return s.filter(F.col("tp") == tp)

        c = (src("c").withWatermark("ts", "10 minutes")
             .select(F.col("v").alias("ck"), F.col("ts").alias("c_ts")))
        p = (src("p").withWatermark("ts", "10 minutes")
             .select(F.col("v").alias("pk"), F.col("ts").alias("p_ts")))
        j = c.join(p, (F.col("ck") == F.col("pk"))
                   & (F.col("p_ts") >= F.col("c_ts"))
                   & (F.col("p_ts") <= F.col("c_ts")
                      + F.expr("INTERVAL 30 MINUTES")))
        agg = (j.groupBy(F.window("p_ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n")))
        q = (agg.select(F.col("w.start").alias("ws"), "n")
             .writeStream.format("memory").queryName(f"chain{tag}")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        drops = sum(x["numRowsDroppedByWatermark"]
                    for pr in q.recentProgress
                    for x in pr["stateOperators"])
        return ({str(r["ws"]): r["n"]
                 for r in spark.table(f"chain{tag}").collect()}, drops)

    # window [10,11): E = 11:00. wm = top - 10m; agg frontier = wm - 30m
    got, drops = run("b1", datetime(2024, 1, 1, 11, 40, 0, 0))
    assert "2024-01-01 10:00:00" not in got, got   # frontier == E: held
    assert drops == 0, drops
    got, drops = run("b2", datetime(2024, 1, 1, 11, 40, 0, 1000))
    assert got.get("2024-01-01 10:00:00") == 1, got  # 1 ms past: sealed
    assert drops == 0, drops


def test_restart_collapses_filter_lag(spark, tmp_path):
    """Pin the t30 restart semantics: Spark commits ONE watermark value
    per batch, so a restarted query seeds BOTH watermarkForLateEvents
    and watermarkForEviction from it — the late filter's one-batch lag
    COLLAPSES at the first recovered batch, then resumes.

    Crafted so the collapse is load-bearing: row 4 (end 13:00) passes
    the uninterrupted lag-2 filter (12:45, from batch a's max 12:55)
    but is behind the restart-collapsed filter (13:15, from batch b's
    max 13:25) — if recovery kept the lagged frontier, row 4 would
    merge into [12,13) and the assertions below fail. Also pins the
    rest of the recovery contract: tranche-A files never re-admit
    (exact window counts through the parquet sink's manifest), and
    aggregation state survives the restart (row 3, admitted before the
    stop, finishes [13,14) together with post-restart row 5)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    TS = lambda h, m: datetime(2024, 1, 1, h, m)  # noqa: E731
    hold = str(tmp_path / "hold")
    live = str(tmp_path / "live")
    data = str(tmp_path / "data")
    ck = str(tmp_path / "ck")
    os.makedirs(live)
    _stage(spark, hold, [
        ("a", [(1, TS(10, 0)), (2, TS(12, 55))], 1_000_000),
        ("b", [(3, TS(13, 25))], 2_000_000),
        ("c", [(4, TS(12, 30)), (5, TS(13, 40))], 3_000_000),
        ("d", [(6, TS(16, 0))], 4_000_000),
    ])

    def run(names):
        for n in names:
            shutil.move(f"{hold}/{n}", f"{live}/{n}")
        s = (spark.readStream
             .schema("event_id long, ts timestamp, v double")
             .option("maxFilesPerTrigger", "1")
             .option("recursiveFileLookup", "true")
             .parquet(live))
        agg = (s.withWatermark("ts", "10 minutes")
                .groupBy(F.window("ts", "1 hour").alias("w"))
                .agg(F.count(F.lit(1)).alias("n")))
        out = agg.select(F.col("w.start").alias("ws"), "n")
        q = (out.writeStream.format("parquet").option("path", data)
             .option("checkpointLocation", ck).outputMode("append")
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return q.recentProgress

    p1 = run(["a", "b"])   # lifetime 1: watermark ends at 13:15
    p2 = run(["c", "d"])   # lifetime 2: brand-new query, same ck

    got = {str(r["ws"]): r["n"]
           for r in spark.read.parquet(data).collect()}
    assert got == {
        "2024-01-01 10:00:00": 1,   # sealed by lifetime 1's final batch
        "2024-01-01 12:00:00": 1,   # row 4 did NOT merge (collapsed lag)
        "2024-01-01 13:00:00": 2,   # state recovered: row 3 + row 5
    }, got

    def drops(ps):
        return sum(x["numRowsDroppedByWatermark"]
                   for p in ps for x in p["stateOperators"])

    assert drops(p1) == 0, p1
    assert drops(p2) == 1, p2   # exactly row 4, at the collapsed filter
