"""Stream-stream join semantics pins (round 4).

The t12/t13 interval joins are oracle-gated at every SF, but the SF
data can't land a click on the exact microsecond eviction boundary —
these tests craft one and pin Spark's observed rule so the oracle's
seal predicate (`ts + 30min < global watermark`, STRICT) can never
silently drift from the engine.
"""

import tempfile

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def boundary_events_dir():
    """Events where the left-outer null-emission boundary is exactly
    probed: global watermark = min(max click ts, max purchase ts)
    − 30 min = T0+90m, so a click at T0+60m has its match window end
    EXACTLY on the watermark."""
    t0 = pd.Timestamp("2025-01-01 00:00:00")
    m = pd.Timedelta(minutes=1)
    rows = [
        (1, t0 + 59 * m, 101, "click", 1.0, "{}"),     # sealed
        (2, t0 + 60 * m, 102, "click", 1.0, "{}"),     # exact boundary
        (3, t0 + 61 * m, 103, "click", 1.0, "{}"),     # unsealed
        (4, t0 + 180 * m, 104, "click", 1.0, "{}"),    # click-side wm
        (5, t0 + 120 * m, 999, "purchase", 2.0, "{}"),  # purchase wm
        # a converting pair well inside the horizon
        (6, t0 + 10 * m, 500, "click", 1.0, "{}"),
        (7, t0 + 20 * m, 500, "purchase", 3.0, "{}"),
    ]
    d = tempfile.mkdtemp(prefix="t13_boundary_")
    pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]).to_parquet(f"{d}/events.parquet")
    return d


def test_left_outer_stream_join_eviction_is_strict(
        spark, boundary_events_dir):
    """Spark null-emits a left row only when its full match window is
    STRICTLY below the final global watermark: the boundary click
    (window end == watermark) is withheld — exactly the `<` the
    oracle's seal predicate states. If this test ever flips to
    emitting the boundary row (engine behavior change), the oracle in
    t13_unconverted_clicks_stream must flip to `<=` in lockstep."""
    from stock_data_warehouse_spark.streaming.jobs import (
        t13_unconverted_clicks_stream,
    )

    out = {r["click_id"]: r for r in t13_unconverted_clicks_stream(
        spark, boundary_events_dir).collect()}
    # converted pair emits eagerly regardless of watermark
    assert out[6]["purchase_id"] == 7 and out[6]["converted"]
    # sealed unconverted click null-emits
    assert out[1]["purchase_id"] is None and not out[1]["converted"]
    # boundary and unsealed clicks are withheld
    assert 2 not in out and 3 not in out and 4 not in out


def test_inner_stream_join_equals_batch_twin_rows(
        spark, boundary_events_dir):
    """The inner stream-stream join emits exactly the batch join's
    pairs on a bounded source — matched pairs never wait for the
    watermark."""
    from stock_data_warehouse_spark.streaming.jobs import (
        t12_interval_join_stream,
    )

    rows = t12_interval_join_stream(spark, boundary_events_dir).collect()
    assert {(r["click_id"], r["purchase_id"]) for r in rows} == {(6, 7)}
    assert rows[0]["lag_us"] == 600_000_000


def test_multifile_interleaved_source_single_batch_contract(spark):
    """ADVICE r4 (medium): t12/t13 oracle equality requires the WHOLE
    bounded source in ONE data micro-batch, not boundedness alone.
    Craft a three-file events dir whose timestamps interleave across
    files, with a qualifying pair SPLIT across them: file A carries
    the pair's purchase plus a late frontier (advancing the
    watermark), file B an unrelated fresh pair (inputs are processed
    BEFORE end-of-batch eviction, so a batch must pass for the
    eviction to land), file C the pair's old click.

    - with per-file micro-batches (maxFilesPerTrigger=1, mtime
      order) the watermark advances after file A, the old purchase's
      state is EVICTED at the end of batch B, and file C's click
      finds nothing -> the join silently loses the pair;
    - with the single-batch setting t12/t13 now use, the stream
      result equals the batch interval join.
    """
    import os
    import tempfile
    import time

    import pandas as pd
    from pyspark.sql import functions as F

    from stock_data_warehouse_spark.streaming.jobs import (
        _run_to_table, events_stream, t12_interval_join_stream,
    )

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    m = pd.Timedelta(minutes=1)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    files = {
        # A: the old purchase + the frontier pair that advances both
        # sides' watermarks to ~9h30
        "part-a.parquet": [
            (4, t0 + 10 * m, 1, "purchase", 2.0, "{}"),
            (2, t0 + 10 * h, 9, "click", 1.0, "{}"),
            (5, t0 + 10 * h + 1 * m, 9, "purchase", 1.0, "{}"),
        ],
        # B: a fresh unrelated pair; end-of-batch eviction now drops
        # purchase 4 (p_ts far below the 9h30 watermark)
        "part-b.parquet": [
            (6, t0 + 10 * h + 2 * m, 8, "click", 1.0, "{}"),
            (7, t0 + 10 * h + 3 * m, 8, "purchase", 1.0, "{}"),
        ],
        # C: the old click whose only match was just evicted
        "part-c.parquet": [
            (3, t0, 1, "click", 1.0, "{}"),
        ],
    }
    d = tempfile.mkdtemp(prefix="t12_multifile_")
    os.mkdir(f"{d}/events.parquet")
    # file-stream admission order is by modification time: stamp
    # strictly increasing mtimes A < B < C
    now = time.time()
    for i, (name, rows) in enumerate(files.items()):
        pd.DataFrame(rows, columns=cols).to_parquet(
            f"{d}/events.parquet/{name}")
        os.utime(f"{d}/events.parquet/{name}",
                 (now - 60 + i * 20, now - 60 + i * 20))

    def interval_join(max_files):
        c = (events_stream(spark, d, max_files_per_trigger=max_files)
             .filter(F.col("event_type") == "click")
             .withWatermark("ts", "30 minutes")
             .select(F.col("user_id").alias("c_user"),
                     F.col("event_id").alias("click_id"),
                     F.col("ts").alias("c_ts")))
        p = (events_stream(spark, d, max_files_per_trigger=max_files)
             .filter(F.col("event_type") == "purchase")
             .withWatermark("ts", "30 minutes")
             .select(F.col("user_id").alias("p_user"),
                     F.col("event_id").alias("purchase_id"),
                     F.col("ts").alias("p_ts")))
        j = c.join(
            p, (F.col("c_user") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") <= F.col("c_ts")
               + F.expr("INTERVAL 30 MINUTES")))
        return {(r["click_id"], r["purchase_id"])
                for r in _run_to_table(j, "append").collect()}

    # the failure mode: per-file batches lose the split pair (3, 4)
    assert interval_join(1) == {(2, 5), (6, 7)}
    # the registered plan (single batch) equals the batch join
    got = {(r["click_id"], r["purchase_id"])
           for r in t12_interval_join_stream(spark, d).collect()}
    assert got == {(2, 5), (3, 4), (6, 7)}


def test_left_outer_seal_is_null_strict_on_one_sided_corpus(spark):
    """ADVICE r4: with NO purchases in the corpus, Spark's global
    watermark (min of both sides; the empty purchase side stays at
    epoch) never advances, so NOTHING emits — the oracle's seal must
    be NULL when either side is absent (DuckDB LEAST would otherwise
    ignore the NULL and null-emit sealed clicks). Run both sides on a
    clicks-only corpus and assert they agree on zero rows."""
    import tempfile

    import duckdb
    import pandas as pd

    import __spark_entry__ as entry_mod
    from stock_data_warehouse_spark.streaming.jobs import (
        t13_unconverted_clicks_stream,
    )

    t0 = pd.Timestamp("2025-01-01 00:00:00")
    h = pd.Timedelta(hours=1)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    rows = pd.DataFrame([
        (1, t0, 1, "click", 1.0, "{}"),
        (2, t0 + 10 * h, 2, "click", 1.0, "{}"),  # deep frontier
    ], columns=cols)
    d = tempfile.mkdtemp(prefix="t13_onesided_")
    rows.to_parquet(f"{d}/events.parquet")

    assert t13_unconverted_clicks_stream(spark, d).count() == 0

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS "
                f"SELECT * FROM '{d}/events.parquet'")
    sql = entry_mod.oracle_sql()["t13_unconverted_clicks_stream"]
    assert len(con.execute(sql).fetchall()) == 0


def test_t21_stream_static_seal_and_enrichment(spark, tmp_path):
    """t21 on crafted micro-data: the stream-static join must (1) pick
    up the static dim per purchase, (2) seal exactly the windows whose
    end + watermark delay has passed the max event time, (3) drop
    purchases whose user has no dim row (inner join). Window W0
    (hour 0) seals because max ts = 02:30 puts the watermark at 02:20;
    window W2 (hour 2, containing the frontier event) must NOT emit."""
    import pandas as pd
    from stock_data_warehouse_spark.streaming.jobs import (
        t21_stream_static_enrich,
    )

    t0 = pd.Timestamp("2025-06-01 00:00:00")
    h, m = pd.Timedelta(hours=1), pd.Timedelta(minutes=1)
    rows = [
        (1, t0 + 10 * m, 0, "purchase", 10.00, "{}"),   # W0, cust 0
        (2, t0 + 20 * m, 1, "purchase", 5.50, "{}"),    # W0, cust 1
        (3, t0 + 30 * m, 9999, "purchase", 7.00, "{}"), # W0, no dim row
        (4, t0 + h + 10 * m, 0, "purchase", 2.25, "{}"),  # W1
        # frontier: a purchase from a DIM-LESS user — advances the
        # watermark (it sits before the join) but emits no row; a
        # click at the same ts would NOT advance it (the frontier is
        # the purchase stream's — Catalyst pushes the type filter
        # below any watermark node)
        (5, t0 + 2 * h + 30 * m, 9998, "purchase", 1.0, "{}"),
    ]
    d = str(tmp_path / "t21_micro")
    import os
    os.makedirs(d)
    pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"
    ]).to_parquet(f"{d}/events.parquet")
    # the dim comes from customer.parquet in the same dir
    from stock_data_warehouse_spark.sources.tables import load_table
    (load_table(spark, "/root/testdata/sf0.001", "customer")
     .filter("c_custkey < 100")
     .write.parquet(f"{d}/customer.parquet"))

    out = {(r["window_start"].hour, r["c_mktsegment"]):
           (r["n_purchases"], r["revenue_cents"])
           for r in t21_stream_static_enrich(spark, d).collect()}
    hours = {k[0] for k in out}
    assert 0 in hours and 1 in hours      # W0, W1 sealed
    assert 2 not in hours                 # frontier's own window withheld
    # per-window totals: W0 has custs 0+1 (user 9999 dropped: no dim),
    # W1 has cust 0 — exact integer cents
    w0 = [v for k, v in out.items() if k[0] == 0]
    assert sum(n for n, _ in w0) == 2
    assert sum(c for _, c in w0) == 1550
    w1 = [v for k, v in out.items() if k[0] == 1]
    assert sum(n for n, _ in w1) == 1 and sum(c for _, c in w1) == 225
