"""Durability drills for the online-maintenance streams (r12,
VERDICT r11 What's-wrong #1 / next-round #1-2).

foreachBatch's documented contract is AT-LEAST-ONCE: a micro-batch can
be re-delivered with the same ``batch_id`` after a failure, and a
restarted query reopens from its checkpoint with a FRESH process (all
in-memory state gone) and the next batch_id. The r12 durable-state kit
(streaming/jobs.py) claims both are safe because every piece of
engine-external state is batch-id-keyed, overwrite-written and
listing-recovered. These tests prove it against the EXACT production
callbacks (the module-level ``_t4x_make_batch`` / ``_x2*_make_batch``
factories are what the registered queries run):

- SAME-BATCH REPLAY: invoke the callback twice with one batch_id
  mid-sequence; final results and state must be bit-identical to the
  uninterrupted run (a second merge of the same batch is the failure
  mode the r11 design had).
- TWO-LIFETIME RESTART (t30-style): run the real file-source +
  checkpoint topology, stop after a mid-stream batch, REBUILD the
  callback from nothing (fresh closure = fresh process — the factories
  hold no mutable state, recovery is pure listing), reopen the same
  checkpoint, drain. Final output must equal the uninterrupted run.
- POLICY RESTART: for the triggered compaction stream, the restart
  boundary is placed so the compaction trigger FIRES in lifetime 2
  from dup debt accrued in lifetime 1 — the production crash scenario
  for a maintenance policy.
"""

import inspect
import shutil

import pytest
from pyspark.sql import functions as F

import stock_data_warehouse_spark.streaming.jobs as J
from stock_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

#: every foreachBatch callback factory under the durable-state
#: contract — new maintenance streams must be added here (and get a
#: replay/restart drill) or the static gate below fails the build
_DURABLE_FACTORIES = [
    "_t40_make_batch", "_t42_make_batch", "_t43_make_batch",
    "_t44_make_batch", "_t45_make_batch", "_t46_make_batch",
    "_x2bc_make_batch", "_x2trig_make_batch",
]


@pytest.mark.parametrize("factory", _DURABLE_FACTORIES)
def test_no_append_writes_in_durable_callbacks(factory):
    """Static gate on the r12 durable-state discipline: a callback
    that slips back to ``mode("append")`` or an in-process version
    counter is retry-unsafe again (the exact r11 finding). Every
    factory must write only batch-id-keyed ``_sdir`` dirs (or the
    ``_ib``-partitioned dynamic overwrite store) and recover
    predecessors by listing."""
    src = inspect.getsource(getattr(J, factory))
    assert 'mode("append")' not in src, factory
    assert "_sdir(" in src, factory
    assert 'state["' not in src, (factory, "in-process state counter")


def test_ingest_stream_bodies_have_no_append_writes():
    """Same gate for the two r10-era ingest streams hardened in r12
    (their callbacks are closures inside the query functions)."""
    for fn in ("x2_incremental_minhash_stream", "x3_ivf_ingest_stream"):
        src = inspect.getsource(getattr(J, fn))
        assert 'mode("append")' not in src, fn
        assert "_sdir(" in src, fn


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _event_quartiles(spark, cols):
    ev = load_table(spark, SF, "events").select(*cols)
    mn, mx = ev.agg(F.min(F.unix_micros("ts")),
                    F.max(F.unix_micros("ts"))).first()
    arr = F.expr(f"((unix_micros(ts) - {mn}) * 4) div ({mx - mn + 1})")
    ev = ev.withColumn("_arr", arr)
    return [ev.filter(F.col("_arr") == k).drop("_arr").localCheckpoint()
            for k in range(4)]


def _doc_quarters(spark):
    d = load_table(spark, SF, "documents").select("doc_id", "text")
    return [d.filter(F.col("doc_id") % 4 == k).localCheckpoint()
            for k in range(4)]


def _doc_pairs(spark):
    d = (load_table(spark, SF, "documents")
         .select("doc_id", "n_chars"))
    return [d.filter(F.col("doc_id") % 4 == k).localCheckpoint()
            for k in range(4)]


# ---------------------------------------------------------------------------
# Same-batch replay: the callback invoked twice with one batch_id must
# leave results AND state identical to the clean run.
# ---------------------------------------------------------------------------

_REPLAY_CASES = [
    # (stream, factory name, batch builder, state family to compare)
    ("t43", "_t43_make_batch",
     lambda s: _event_quartiles(
         s, ["event_id", "ts", "event_type", "value"]), "dcy"),
    ("t42", "_t42_make_batch", _doc_pairs, "rsv"),
    ("t44", "_t44_make_batch",
     lambda s: _event_quartiles(s, ["event_id", "ts", "user_id"]),
     "kmv"),
    ("t45", "_t45_make_batch", _doc_quarters, "mgs"),
]


@pytest.mark.parametrize("name,factory,builder,fam", _REPLAY_CASES,
                         ids=[c[0] for c in _REPLAY_CASES])
def test_same_batch_replay_is_idempotent(spark, name, factory,
                                         builder, fam):
    batches = builder(spark)
    make = getattr(J, factory)

    def run(out_dir, schedule):
        cb = make(spark, out_dir)
        for bid, df in schedule:
            cb(df, bid)
        sroot = f"{out_dir}/state"
        return (_rows(J._read_family(spark, sroot, "res")),
                _rows(spark.read.parquet(J._sdir(sroot, fam, 3))))

    clean = run(J._mkdtemp(prefix=f"dur_{name}_clean_"),
                list(enumerate(batches)))
    # re-deliver batch 1 (the first one that MERGES prior state)
    replay = run(J._mkdtemp(prefix=f"dur_{name}_replay_"),
                 [(0, batches[0]), (1, batches[1]), (1, batches[1]),
                  (2, batches[2]), (3, batches[3])])
    assert replay == clean


def test_t40_same_batch_replay_including_band_store(spark):
    """t40's replay drill also pins the band STORE (the per-batch
    partitioned-tree path): a re-delivered batch must not leave a
    second copy of its rows in its own store tree — the quantiles
    would silently shift for every later batch."""
    batches = _event_quartiles(spark, ["event_id", "ts", "value"])

    def run(out_dir, schedule):
        cb = J._t40_make_batch(spark, out_dir)
        for bid, df in schedule:
            cb(df, bid)
        sroot = f"{out_dir}/state"
        store = [(v, _rows(spark.read
                           .parquet(J._sdir(sroot, "store", v))
                           .select("value", "_qb")))
                 for v in J._committed_versions(sroot, "store")]
        return (_rows(J._read_family(spark, sroot, "res")),
                _rows(spark.read.parquet(J._sdir(sroot, "bands", 3))),
                store)

    clean = run(J._mkdtemp(prefix="dur_t40_clean_"),
                list(enumerate(batches)))
    replay = run(J._mkdtemp(prefix="dur_t40_replay_"),
                 [(0, batches[0]), (1, batches[1]), (1, batches[1]),
                  (2, batches[2]), (3, batches[3])])
    assert replay == clean


# ---------------------------------------------------------------------------
# Two-lifetime restart (t30-style): real file source, real checkpoint,
# the callback REBUILT from nothing between lifetimes.
# ---------------------------------------------------------------------------


def _run_stream_lifetimes(spark, out_dir, hold, schema, make_cb,
                          tranches):
    """Drive the production topology across query lifetimes: per
    lifetime, move the tranche's staged files into the live landing
    zone, build a FRESH callback (no shared closure state — a new
    process), open a brand-new query on the SAME checkpoint, drain
    with AvailableNow."""
    live = f"{out_dir}/live"
    for files in tranches:
        for fn in files:
            shutil.move(f"{hold}/{fn}", f"{live}/{fn}")
        cb = make_cb()
        s = (spark.readStream.schema(schema)
             .option("maxFilesPerTrigger", "1")
             .option("recursiveFileLookup", "true")
             .parquet(live))
        sq = (s.writeStream.foreachBatch(cb)
              .option("checkpointLocation", f"{out_dir}/checkpoint")
              .trigger(availableNow=True)
              .start())
        sq.awaitTermination()


def test_t40_two_lifetime_restart(spark):
    ev = (load_table(spark, SF, "events")
          .select("event_id", "ts", "value"))
    mn, mx = ev.agg(F.min(F.unix_micros("ts")),
                    F.max(F.unix_micros("ts"))).first()
    arrival = F.expr(f"((unix_micros(ts) - {mn}) * 4) "
                     f"div ({mx - mn + 1})")
    staged = ev.withColumn("arrival", arrival)
    schema = "event_id long, ts timestamp, value double"

    def run(tranches):
        out_dir = J._mkdtemp(prefix="dur_t40_restart_")
        hold = f"{out_dir}/hold"
        J._write_arrival_files(spark, staged, hold, n_files=4)
        _run_stream_lifetimes(
            spark, out_dir, hold, schema,
            lambda: J._t40_make_batch(spark, out_dir), tranches)
        return _rows(J._read_family(spark, f"{out_dir}/state", "res"))

    uninterrupted = run([["a0", "a1", "a2", "a3"]])
    restarted = run([["a0", "a1"], ["a2", "a3"]])
    assert restarted == uninterrupted
    assert len(uninterrupted) == 4  # one exact answer per batch


def test_kit_version_selection_contract(tmp_path):
    """Pure-python pin of the kit's recovery reads: only
    ``_SUCCESS``-marked dirs are committed; predecessors are strictly
    before the batch_id (a failed attempt's own dir is invisible);
    the segmented-store live set is (latest prior snapshot else base)
    + increments after it, with include_current selecting the
    batch-start vs post-append view."""
    import os
    root = str(tmp_path)

    def mk(name, committed=True):
        d = os.path.join(root, name)
        os.makedirs(d)
        if committed:
            open(os.path.join(d, "_SUCCESS"), "w").close()

    mk("fam_b0"); mk("fam_b1"); mk("fam_b3")
    mk("fam_b2", committed=False)          # crashed attempt: invisible
    assert J._committed_versions(root, "fam") == [0, 1, 3]
    assert J._versions_before(root, "fam", 3) == [0, 1]
    assert J._latest_before(root, "fam", 3) == J._sdir(root, "fam", 1)
    assert J._latest_before(root, "fam", 0) is None

    mk("inc_b0"); mk("inc_b1"); mk("inc_b2"); mk("cmp_b1")
    base = os.path.join(root, "base")
    # batch 2's probe snapshot: snapshot cmp_b1 (< 2), no later incs
    assert J._live_segments(root, "cmp", "inc", base, 2, False) == [
        J._sdir(root, "cmp", 1)]
    # batch 2's post-append view: cmp_b1 + its own inc_b2
    assert J._live_segments(root, "cmp", "inc", base, 2, True) == [
        J._sdir(root, "cmp", 1), J._sdir(root, "inc", 2)]
    # batch 1 RETRY after its failed attempt already wrote cmp_b1:
    # its own snapshot is invisible — base + inc_b0 (+ own inc with
    # include_current), exactly the first attempt's inputs
    assert J._live_segments(root, "cmp", "inc", base, 1, False) == [
        base, J._sdir(root, "inc", 0)]
    assert J._live_segments(root, "cmp", "inc", base, 1, True) == [
        base, J._sdir(root, "inc", 0), J._sdir(root, "inc", 1)]
    # final read: latest snapshot + everything after it
    assert J._live_segments(root, "cmp", "inc", base) == [
        J._sdir(root, "cmp", 1), J._sdir(root, "inc", 2)]


def test_t45_two_lifetime_restart(spark):
    """Second restart drill on the stream with the most state SHAPES
    (MG counters + the cumulative-subtracted-mass error ledger): stop
    after batch 1, rebuild the callback from nothing, drain. The
    ledger is the subtle one — an in-memory s_cum would silently
    reset to 0 in lifetime 2 and deflate every later bound."""
    d = (load_table(spark, SF, "documents")
         .select("doc_id", "text"))
    staged = d.withColumn("arrival", (F.col("doc_id") % 4).cast("int"))
    schema = "doc_id long, text string"

    def run(tranches):
        out_dir = J._mkdtemp(prefix="dur_t45_restart_")
        hold = f"{out_dir}/hold"
        J._write_arrival_files(spark, staged, hold, n_files=4)
        _run_stream_lifetimes(
            spark, out_dir, hold, schema,
            lambda: J._t45_make_batch(spark, out_dir), tranches)
        sroot = f"{out_dir}/state"
        return (_rows(J._read_family(spark, sroot, "res")),
                _rows(J._read_family(spark, sroot, "cum")))

    uninterrupted = run([["a0", "a1", "a2", "a3"]])
    restarted = run([["a0", "a1"], ["a2", "a3"]])
    assert restarted == uninterrupted


def test_x2_triggered_restart_fires_in_second_lifetime(spark):
    """The policy restart drill (VERDICT r11 next-round #2): at
    sf0.001 the trigger decisions are (F, F, T) — so stopping after
    batch 1 puts ALL the dup debt accrual in lifetime 1 and the FIRE
    in lifetime 2. Recovery must restore the verdict ledger, the
    removed ledger (empty) and the segmented store well enough that
    the restarted process reaches the identical compaction decision
    and store size."""
    from stock_data_warehouse_spark.plans.extensions import (
        _portable_bands)

    d = load_table(spark, SF, "documents")
    corpus = d.filter(F.col("doc_id") < 400)
    arrivals = d.filter(F.col("doc_id") >= 400)
    staged = (arrivals.select("doc_id", "text")
              .withColumn("arrival", F.col("doc_id") % 3))
    schema = "doc_id long, text string"

    def run(tranches):
        out_dir = J._mkdtemp(prefix="dur_x2trig_restart_")
        sroot = f"{out_dir}/state"
        _portable_bands(corpus).write.parquet(f"{sroot}/bidx_base")
        J._x2_postings(corpus).write.parquet(f"{sroot}/bpost_base")
        hold = f"{out_dir}/hold"
        J._write_arrival_files(spark, staged, hold, n_files=3)
        _run_stream_lifetimes(
            spark, out_dir, hold, schema,
            lambda: J._x2trig_make_batch(spark, out_dir), tranches)
        res = _rows(J._read_family(spark, sroot, "res"))
        return res, J._committed_versions(sroot, "rmv")

    clean_res, clean_rmv = run([["a0", "a1", "a2"]])
    rest_res, rest_rmv = run([["a0", "a1"], ["a2"]])
    assert rest_res == clean_res
    assert rest_rmv == clean_rmv
    # the drill's precondition: the fire actually lands in batch 2,
    # i.e. lifetime 2 of the restarted run (data-dependent — if a
    # testdata regeneration moves it, re-site the split point)
    fired = [r[5] for r in clean_res]  # compaction_fired per batch
    assert fired == [False, False, True]
    assert clean_rmv == [2]
