"""Session-conf behavior of the table loader (VERDICT r2 item 8).

``load_table`` pins two session confs at read time (UTC timezone,
``nanosAsLong`` for the events nanos encoding). Both are constants, so
concurrent query builds on one session must converge regardless of
interleaving — and the steady state must hold the pinned values.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from stock_data_warehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_confs_pinned_after_load(spark):
    load_table(spark, SF, "events")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
            == "true")


def test_ensure_conf_is_idempotent(spark):
    from stock_data_warehouse_spark.sources.tables import _ensure_conf
    _ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    _ensure_conf(spark, "spark.sql.session.timeZone", "UTC")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_concurrent_builds_converge(spark):
    """Eight threads concurrently build+run event and lineitem scans;
    every result must be correct and the confs must end pinned —
    no order-dependent session state."""
    def build_and_count(i: int) -> int:
        name = "events" if i % 2 == 0 else "lineitem"
        return load_table(spark, SF, name).count()

    with ThreadPoolExecutor(max_workers=8) as ex:
        counts = list(ex.map(build_and_count, range(8)))

    assert len(set(counts[0::2])) == 1  # all events counts agree
    assert len(set(counts[1::2])) == 1  # all lineitem counts agree
    assert all(c > 0 for c in counts)
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    assert (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
            == "true")
