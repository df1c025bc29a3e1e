"""Design-time degeneracy probe — run a query's ORACLE at all 3 SFs.

The rule this automates (CLAUDE.md; it killed/reframed 2 queries in r9
and 3 shapes in r10): before registering an audit-style query, run its
DuckDB oracle at every shipped SF and look for degenerate output — an
always-empty result passes the driver's hash vacuously, and an
all-constant column carries no signal. This tool does the mechanical
part for ALREADY-REGISTERED queries too, so a regression that silently
drains a query's output (new testdata generation, a reframed filter)
is visible without Spark in the loop.

Usage:
    python tools/degeneracy_probe.py q1 q2 ...     # named queries
    python tools/degeneracy_probe.py --all         # whole catalog

Reports per (query, SF): row count, and which columns are constant
across all rows (ignoring one-row results, where "constant" is
meaningless). Exit 1 if any probed query is EMPTY at every SF; exit 2
if any probed oracle ERRORS at every SF (ADVICE r10: a fully broken
oracle must not pass the gate an always-empty one fails).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SFS = ("sf0.001", "sf0.01", "sf0.1")
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def main() -> int:
    import duckdb
    import __spark_entry__ as entry_mod

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--root", default="/root/testdata")
    args = ap.parse_args()

    oracles = entry_mod.oracle_sql()
    names = sorted(oracles) if args.all else args.names
    unknown = [n for n in names if n not in oracles]
    if unknown:
        print(f"unknown / rows-only queries: {unknown}", file=sys.stderr)
        return 2

    always_empty = []
    always_error = []
    for name in names:
        rows_per_sf = []
        n_errors = 0
        for sf in SFS:
            con = duckdb.connect()
            for t in TABLES:
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{args.root}/{sf}/{t}.parquet'")
            try:
                rel = con.sql(oracles[name])
                cols = rel.columns
                data = rel.fetchall()
            except Exception as ex:  # noqa: BLE001 — report, keep going
                print(f"{name} @ {sf}: ORACLE ERROR {ex}")
                data, cols = None, []
                n_errors += 1
            finally:
                con.close()
            if data is None:
                continue
            rows_per_sf.append(len(data))
            const = []
            if len(data) > 1:
                for i, c in enumerate(cols):
                    vals = {repr(r[i]) for r in data}
                    if len(vals) == 1:
                        const.append(c)
            flag = ""
            if not data:
                flag = "  << EMPTY"
            elif len(data) > 1 and len(const) == len(cols):
                flag = "  << ALL-CONSTANT"
            note = f" constant={const}" if const else ""
            print(f"{name} @ {sf}: {len(data)} rows{note}{flag}")
        if rows_per_sf and not any(rows_per_sf):
            always_empty.append(name)
        if n_errors == len(SFS):
            always_error.append(name)

    if always_error:
        print(f"\nORACLE ERRORED AT EVERY SF (broken oracle): "
              f"{always_error}")
        return 2
    if always_empty:
        print(f"\nEMPTY AT EVERY SF (vacuous hash pass): {always_empty}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
