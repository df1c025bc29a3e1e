"""Continuous output-degeneracy gate (r11, VERDICT r10 next-round #6).

The round-close habit `tools/degeneracy_probe.py --all` (all 3 SFs)
caught vacuous-hash and broken-oracle regressions only once per round;
this promotes its cheapest slice — EVERY registered oracle at sf0.001,
DuckDB only, no Spark — into pytest, so a testdata regeneration or a
reframed filter that silently drains a query's output fails CI the day
it lands, not at round close. ~60 s for the full catalog.

Two assertions per the probe's contract:

- no oracle ERRORS (a broken oracle must not pass the gate an empty
  one fails — ADVICE r10 on the probe's exit codes);
- the set of sf0.001-EMPTY queries is ⊆ a pinned allowlist of results
  that are legitimately empty at the smallest SF but non-empty at
  sf0.01/sf0.1 (verified by the committed full 3-SF audits,
  SWEEPS_r10.md's 1035-probe run). A new empty query means either a
  drained output (bug) or a new legitimately-sparse shape — in which
  case run `python tools/degeneracy_probe.py <name>` (all 3 SFs) and
  extend the allowlist with a note, exactly the design-probe rule in
  CLAUDE.md.
"""

from __future__ import annotations

import duckdb

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")

#: empty at sf0.001 ONLY — each verified non-empty at sf0.01 and sf0.1
#: (r10 full audit + re-probed r11): j6's anti-join has no orderless
#: customers in the tiny slice; q11's value threshold scales with the
#: total so the 0.001 slice clears it nowhere; x4_decontaminate finds
#: no eval-set 13-gram collisions in 500 docs.
ALLOWED_EMPTY_SF0001 = {
    "j6_anti_customers_without_orders",
    "q11_important_parts",
    "x4_decontaminate",
}


def test_every_oracle_is_nonvacuous_at_sf0001():
    oracles = entry_mod.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{SF_DIR}/{t}.parquet'")
    empties, errors = [], []
    for name, sql in sorted(oracles.items()):
        try:
            if not con.sql(sql).fetchall():
                empties.append(name)
        except Exception as ex:  # noqa: BLE001 — collect, report all
            errors.append((name, f"{type(ex).__name__}: {ex}"))
    con.close()
    assert not errors, errors
    unexpected = sorted(set(empties) - ALLOWED_EMPTY_SF0001)
    assert not unexpected, (
        "oracle newly EMPTY at sf0.001 — drained output or a new "
        "sparse shape; 3-SF-probe before allowlisting", unexpected)
