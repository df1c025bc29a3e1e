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
