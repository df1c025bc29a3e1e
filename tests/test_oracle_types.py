"""Standing gate for the HUGEINT oracle hazard (SWEEPS_r07.md).

DuckDB SUM(BIGINT) returns HUGEINT and fetchdf() degrades HUGEINT to
float64, truncating integer-exact values at 13+ significant digits —
a failure that only fires once the data is big enough. Every oracle's
OUTPUT schema must therefore be free of HUGEINT/DECIMAL columns (outer
CAST .. AS BIGINT); this test DESCRIBEs all of them so a regression is
a test failure at any SF, not a value-hash surprise at sf0.1+.
"""

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def test_no_hugeint_or_decimal_oracle_outputs():
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    flagged = []
    for name, sql in sorted(entry_mod.oracle_sql().items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception:
            # events-encoding-dependent oracles may not DESCRIBE against
            # the raw view; the full checker covers them with real reads
            continue
        for col, typ, *_ in desc:
            up = typ.upper()
            if "HUGEINT" in up or up.startswith("DECIMAL"):
                flagged.append(f"{name}.{col}: {typ}")
    assert not flagged, (
        "oracle output columns that fetchdf() will degrade to float64 "
        "(add an outer CAST .. AS BIGINT): " + ", ".join(flagged))
