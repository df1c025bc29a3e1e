"""Oracle output-type audit: flag HUGEINT/DECIMAL columns before they bite.

DuckDB's ``SUM(BIGINT)`` returns HUGEINT, and ``fetchdf()`` degrades
HUGEINT to float64 — silently truncating at 13+ significant digits, so
an integer-exact oracle column hash-mismatches the Spark long ONLY once
the data is big enough (measured: a 2.6e12 cents sum at sf0.1,
SWEEPS_r07.md). The fix is an outer ``CAST(SUM(..) AS BIGINT)`` in the
oracle; this audit finds every output column that still needs one by
DESCRIBE-ing every registered oracle against the sf views.

Usage: python tools/oracle_type_audit.py [--sf DIR]   # exit 1 if flagged
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, "/root/repo")

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    args = ap.parse_args()

    import duckdb
    import __spark_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'")
    flagged = []
    for name, sql in sorted(entry_mod.oracle_sql().items()):
        try:
            desc = con.execute(f"DESCRIBE ({sql})").fetchall()
        except Exception as exc:  # events-encoding variants etc.
            print(f"  ?? {name}: DESCRIBE failed: {str(exc)[:90]}")
            continue
        for col, typ, *_ in desc:
            up = typ.upper()
            if "HUGEINT" in up or up.startswith("DECIMAL"):
                flagged.append((name, col, typ))
                print(f"  XX {name}.{col}: {typ} — fetchdf() degrades "
                      f"this to float64; add an outer BIGINT cast")
    print(f"\n{len(flagged)} flagged column(s)")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
