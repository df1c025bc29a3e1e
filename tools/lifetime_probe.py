"""Long-lifetime drill for the durable-state kit's retention step
(r13; two-tier compaction r14 — VERDICT r13 next-round #3): drive
t40's PRODUCTION callback through a real AvailableNow file-source
stream of N micro-batches (default 64 — 16x the catalog demo) and
record, per batch, the wall time and every state-metadata quantity
retention claims to bound:

- committed ``bands`` versions (monoid family — must stay <= keep),
- committed ``store`` increments, ``storer`` runs, ``storec``
  snapshots,
- the LIVE store set the quantile read unions (must stay <=
  ``_STORE_LIVE_BOUND``),
- every compaction FIRE with the rows it rewrote — the r14 claim is
  that the COMMON fire (increments -> run) rewrites a bounded number
  of rows regardless of lifetime, while the rare snapshot fire
  (period R*(K-1) batches) is the only O(prefix) rewrite.

Without retention all of these grow O(#batches) and per-batch wall
time creeps with them (the listing + the union plan); with it the
table is flat. The probe ends with a value-parity check: the final
batch's answer must equal the batch staircase over the whole
relation (retention must never change a value).

Usage:  python tools/lifetime_probe.py [--batches 64] [--sf DIR]
Emits a markdown table on stdout plus one JSON line (prefix
``LIFETIME_JSON:``) for committing next to SWEEPS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=64)
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("--run-threshold", type=int, default=None,
                    help="override _STORE_RUN_INCREMENTS (A/B of "
                         "compaction policies: 8 with "
                         "--snap-threshold 1 emulates the r13 "
                         "single-level trigger — every fire is a "
                         "full-prefix snapshot)")
    ap.add_argument("--snap-threshold", type=int, default=None,
                    help="override _STORE_COMPACT_RUNS")
    args = ap.parse_args()
    n = args.batches

    from stock_data_warehouse_spark.session import get_spark
    from stock_data_warehouse_spark.sources.tables import load_table
    import stock_data_warehouse_spark.streaming.jobs as J
    from stock_data_warehouse_spark.operators.staircase import (
        bucketed_exact_quantiles, double_value_bucket)
    from stock_data_warehouse_spark.functions.scalars import (
        round_half_up)

    spark = get_spark("lifetime_probe")
    if args.run_threshold is not None:
        J._STORE_RUN_INCREMENTS = args.run_threshold
    if args.snap_threshold is not None:
        J._STORE_COMPACT_RUNS = args.snap_threshold
    out_dir = J._mkdtemp(prefix="lifetime_t40_")
    stage = f"{out_dir}/landing"
    sroot = f"{out_dir}/state"

    ev = (load_table(spark, args.sf, "events")
          .select("event_id", "ts", "value"))
    mn, mx = ev.agg(F.min(F.unix_micros("ts")),
                    F.max(F.unix_micros("ts"))).first()
    arrival = F.expr(f"((unix_micros(ts) - {mn}) * {n}) "
                     f"div ({mx - mn + 1})")
    n_staged = J._write_arrival_files(
        spark, ev.withColumn("arrival", arrival), stage, n_files=n)

    inner = J._t40_make_batch(spark, out_dir)
    rows = []
    fires = []

    def timed(batch_df, batch_id):
        pre = {fam: set(J._committed_versions(sroot, fam))
               for fam in ("storer", "storec")}
        t0 = time.time()
        inner(batch_df, batch_id)
        wall = time.time() - t0
        bands = len(J._committed_versions(sroot, "bands"))
        store = len(J._committed_versions(sroot, "store"))
        runs = J._committed_versions(sroot, "storer")
        snaps = J._committed_versions(sroot, "storec")
        live = len(J._store_live_trees(sroot, "store", "storec",
                                       batch_id, inclusive=True))
        rows.append({"batch": batch_id, "wall_s": round(wall, 3),
                     "bands_vs": bands, "store_trees": store,
                     "runs": len(runs), "snapshots": len(snaps),
                     "live_set": live})
        # per-fire rewrite accounting (outside the timed section):
        # count the rows of any run/snapshot this batch created
        for kind, fam in (("run", "storer"), ("snapshot", "storec")):
            for v in sorted(set(J._committed_versions(sroot, fam))
                            - pre[fam]):
                cnt = spark.read.parquet(
                    J._sdir(sroot, fam, v)).count()
                fires.append({"batch": int(batch_id), "kind": kind,
                              "rewritten_rows": int(cnt)})

    s = (spark.readStream
         .schema("event_id long, ts timestamp, value double")
         .option("maxFilesPerTrigger", "1")
         .option("recursiveFileLookup", "true")
         .parquet(stage))
    t0 = time.time()
    sq = (s.writeStream.foreachBatch(timed)
          .option("checkpointLocation", f"{out_dir}/checkpoint")
          .trigger(availableNow=True)
          .start())
    sq.awaitTermination()
    total = time.time() - t0

    # value parity at depth: final answer == batch staircase over all
    last = J._committed_versions(sroot, "res")[-1]
    got = spark.read.parquet(J._sdir(sroot, "res", last)).first()
    want = (bucketed_exact_quantiles(
                ev.select("value"), [], "value", [0.5, 0.95],
                bucket=double_value_bucket(F.col("value"), 2.0))
            .select("n", round_half_up(F.col("q0"), 6).alias("p50"),
                    round_half_up(F.col("q1"), 6).alias("p95"))
            .first())
    parity = (got["n_events"] == want["n"]
              and got["p50_value"] == want["p50"]
              and got["p95_value"] == want["p95"])

    print(f"t40 lifetime probe: {len(rows)} data batches "
          f"({n_staged} rows staged, {args.sf}), total {total:.1f}s")
    print()
    print("| batch | wall_s | bands_vs | store_trees | runs "
          "| snapshots | live_set |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['batch']} | {r['wall_s']} | {r['bands_vs']} "
              f"| {r['store_trees']} | {r['runs']} "
              f"| {r['snapshots']} | {r['live_set']} |")
    print()
    print("| fire batch | kind | rewritten_rows |")
    print("|---|---|---|")
    for f_ in fires:
        print(f"| {f_['batch']} | {f_['kind']} "
              f"| {f_['rewritten_rows']} |")
    halves = [rr["wall_s"] for rr in rows]
    h1 = sum(halves[:len(halves) // 2]) / (len(halves) // 2)
    h2 = sum(halves[len(halves) // 2:]) / (len(halves)
                                           - len(halves) // 2)
    run_rows = [f_["rewritten_rows"] for f_ in fires
                if f_["kind"] == "run"]
    snap_rows = [f_["rewritten_rows"] for f_ in fires
                 if f_["kind"] == "snapshot"]
    print()
    print(f"mean per-batch wall: first half {h1:.3f}s, "
          f"second half {h2:.3f}s (ratio {h2 / h1:.2f}x); "
          f"max bands_vs {max(r['bands_vs'] for r in rows)}, "
          f"max live_set {max(r['live_set'] for r in rows)}; "
          f"run fires {len(run_rows)} (max rewrite "
          f"{max(run_rows) if run_rows else 0} rows — bounded), "
          f"snapshot fires {len(snap_rows)} (rows "
          f"{snap_rows}); "
          f"final-answer parity with batch staircase: {parity}")
    record = {"metric": "t40_lifetime_probe", "batches": len(rows),
              "run_threshold": J._STORE_RUN_INCREMENTS,
              "snap_threshold": J._STORE_COMPACT_RUNS,
              "rows_staged": n_staged, "sf_dir": args.sf,
              "total_s": round(total, 1),
              "mean_wall_first_half_s": round(h1, 3),
              "mean_wall_second_half_s": round(h2, 3),
              "max_bands_versions": max(r["bands_vs"] for r in rows),
              "max_live_set": max(r["live_set"] for r in rows),
              "max_store_trees": max(r["store_trees"] for r in rows),
              "run_fires": len(run_rows),
              "max_run_rewrite_rows": (max(run_rows) if run_rows
                                       else 0),
              "snapshot_fires": len(snap_rows),
              "snapshot_rewrite_rows": snap_rows,
              "parity": bool(parity),
              "fires": fires,
              "per_batch": rows}
    print("LIFETIME_JSON:" + json.dumps(record))
    spark.stop()
    return 0 if parity else 1


if __name__ == "__main__":
    sys.exit(main())
