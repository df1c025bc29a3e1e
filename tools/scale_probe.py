"""Empirical scale probe (VERDICT r9 next-round #3): measure, don't argue.

The 100x-scale claims for the scale-sensitive families rest on shuffle
accounting (SCALE.md) and plan pins; this probe adds MEASUREMENT:
inflate sf0.1 ~8x into a temp dir by unioning key-shifted copies (keys
offset per copy so cardinalities scale), then time the families whose
scaling is non-obvious at both sizes and report the ratio.

Inflation semantics (this is a PERF probe, not a correctness gate — no
oracle runs on the inflated data):

- customer / orders / lineitem / part / supplier: ids offset by
  copy_index * (max_id + 1) so key cardinality scales with the data (a
  naive row-duplication would instead deepen every key group 8x and
  measure skew, not scale). lineitem offsets l_partkey/l_suppkey too
  (ADVICE r10: verbatim-duplicated dim keys would deepen part/supplier
  groups 8x and measure skew for any family joining them).
- events: event_id/user_id offset per copy; ``ts`` kept IDENTICAL —
  the honest streaming scale axis is arrival RATE at a fixed lateness
  horizon (8x rows per time-quantile micro-batch, same disorder
  pattern), and offsetting user_id keeps per-key state-store depth
  constant while the key count grows. Offsetting ts instead would
  stretch history and leave per-batch volume unchanged.
- documents: doc_id offset; text alphabet ROTATED per copy
  (translate on the lowercased text) so each copy's token/shingle
  vocabulary is disjoint — the near-dup rate and the banded join's
  df distribution stay CONSTANT while N and vocabulary grow 8x.
  Duplicating text verbatim would give every doc 8 identical twins and
  grow band collisions quadratically in the copy count — a skew test,
  not a scale test (the same trap the modular-wave probe caught for
  x2_band_index_compaction). doc_id offset is a multiple of 5, so the
  modular wave splits keep their proportions.
- embeddings: vec_id offset; the vector is circularly shifted by the
  copy index so copies are geometrically distinct but norm-identical
  (IVF/OOD cost is geometry-independent; exact-twin vectors would
  degenerate every neighborhood). ``label`` is offset per copy too
  (r11): the kNN families group all-pairs work by label, whose scale
  contract is BOUNDED group size (at 100 TB the grouping key is an
  IVF cell — x2_knn_pagerank docstring), so the honest axis grows
  group COUNT at constant size. Verbatim labels deepen every group
  8x and square the pair work — MEASURED as 45.6x/56.1x at 8x before
  this fix (BASELINE.md r11 probe table keeps both numbers: the
  violation is the empirical proof the bounded-group contract is
  load-bearing, not pedantry).

Run:  python tools/scale_probe.py [--factor 8] [--rebuild] [--only f1,f2]
Emits one JSON line per family to stdout and a summary JSON at the end;
progress to stderr. The adjudicated results live in BASELINE.md
("Empirical scale probe" section).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: default output dir carries the factor so an 8x build and a 32x/64x
#: build never clobber each other (r11: multi-factor probing).
OUT_TMPL = os.environ.get("SPARK_GRAFT_SCALE_DIR",
                          "/tmp/scale_probe_x{factor}")
N_ITER = int(os.environ.get("SPARK_GRAFT_BENCH_ITER", "2"))

#: family -> registered query name. One representative per
#: scale-sensitive mechanism named by the r9 verdict.
FAMILIES = {
    # staircase consumers: the level-2 N/B law under 8x N
    "staircase_bounded_key": "a45_basket_quantiles",
    "staircase_global_rank": "a52_spend_decile_profile",
    "staircase_multi_pass": "a35_reorder_intervals",
    "staircase_double_band": "x3_ood_score",
    "staircase_midranks": "x6_auc_exact",
    # banded near-dup joins: sum(df^2) growth under constant dup rate
    "neardup_banded_join": "x2_neardup_minhash_portable",
    "neardup_frozen_index": "x2_incremental_minhash",
    "neardup_ingest_stream": "x2_incremental_minhash_stream",
    # IVF: N x K_COARSE assignment (K fixed by hash-rank selection)
    "ivf_build_serve": "x3_ivf_topk",
    # r10 additions: the dedup maintain steps (batch rewrite + online
    # compaction mid-stream) and the per-half staircase rank
    "neardup_maintain": "x2_band_index_compaction",
    "neardup_maintain_stream": "x2_band_compaction_stream",
    "staircase_per_half_rank": "a57_decile_migration",
    # r11 additions (VERDICT r10 next-round #1): the families SCALE.md
    # argues but r10 left unmeasured.
    # streaming advance: state-store rows ~ arrival rate x lateness
    # horizon — events inflation keeps ts (same horizon) and 8x's the
    # per-micro-batch volume, the production "more traffic" axis
    "stream_join_advance": "t23_interval_join_advance",
    "stream_state_timeout": "t27_state_timeout_advance",
    # kNN graph: edges grow with N*k; wedge work rides degree skew —
    # the degree-ordered iterator's O(m^1.5) bound gets a data point
    "knn_graph_pagerank": "x2_knn_pagerank",
    "knn_graph_triangles": "x2_triangle_count",
    # salted skew join: the hot-key cardinality is FIXED (3 return
    # flags) while N grows — the one shape where honest inflation
    # MUST deepen the key groups; the salt is what keeps it linear
    "skew_join_salted": "j12_salted_skew_join",
    # r11 new queries measured on arrival: the online staircase
    # (per-batch cost O(batch + bands + N/B) by design) and the
    # policy-driven compaction (per-batch trigger read is bounded
    # metadata; fires are anti-join rewrites)
    "staircase_stream": "t40_quantile_monitor_stream",
    "neardup_maintain_policy": "x2_triggered_compaction_stream",
    # r11 batch 2: CDC chunking (per-doc token windows — expect ~linear
    # in token mass), the graded-retrieval eval (32-query broadcast x N
    # brute force — expect linear), and two of the online-maintenance
    # streams (constant state; expect near-flat like t40). All six
    # r11 streams are now MEASURED (8x on arrival; 32x for t42-t46).
    "cdc_chunk_dedup": "x2_cdc_chunk_dedup",
    "graded_retrieval_eval": "x6_ndcg_mrr_report",
    "reservoir_stream": "t42_reservoir_sample_stream",
    "distinct_monitor_stream": "t44_distinct_monitor_stream",
    "heavy_hitter_stream": "t45_heavy_hitter_stream",
    "prequential_anomaly_stream": "t46_prequential_anomaly_stream",
    "decayed_counter_stream": "t43_decayed_counter_stream",
    # r12: the PSI-triggered recalibration policy (bounded-bin PSI +
    # broadcast-grid refits — expect ~linear in the corpus pass)
    "psi_recalibration": "x6_psi_triggered_recalibration",
}

ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build(base: str, out: str, factor: int) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()

    def mx(table: str, key: str) -> int:
        return con.sql(
            f"SELECT MAX({key}) FROM '{base}/{table}.parquet'"
        ).fetchone()[0] + 1

    c_off, o_off, d_off = (mx("customer", "c_custkey"),
                           mx("orders", "o_orderkey"),
                           mx("documents", "doc_id"))
    p_off, s_off = mx("part", "p_partkey"), mx("supplier", "s_suppkey")
    e_off, u_off = mx("events", "event_id"), mx("events", "user_id")
    # documents/embeddings share the dense 0..N-1 id domain; keep the
    # modular wave splits balanced by rounding the offset up to a
    # multiple of 5 (5000 already is at sf0.1, but don't rely on it).
    d_off += (-d_off) % 5

    def inflate(table: str, replace: "callable") -> None:
        parts = " UNION ALL ".join(
            f"SELECT * REPLACE ({replace(k)}) "
            f"FROM '{base}/{table}.parquet'" for k in range(factor))
        con.sql(f"COPY ({parts}) TO '{out}/{table}.parquet' "
                f"(FORMAT PARQUET)")
        print(f"#  built {table}", file=sys.stderr)

    inflate("customer", lambda k: f"c_custkey + {k * c_off} AS c_custkey")
    inflate("orders", lambda k: (f"o_orderkey + {k * o_off} AS o_orderkey, "
                                 f"o_custkey + {k * c_off} AS o_custkey"))
    inflate("lineitem", lambda k: (f"l_orderkey + {k * o_off} AS l_orderkey, "
                                   f"l_partkey + {k * p_off} AS l_partkey, "
                                   f"l_suppkey + {k * s_off} AS l_suppkey"))
    inflate("part", lambda k: f"p_partkey + {k * p_off} AS p_partkey")
    inflate("supplier", lambda k: f"s_suppkey + {k * s_off} AS s_suppkey")
    inflate("events", lambda k: (f"event_id + {k * e_off} AS event_id, "
                                 f"user_id + {k * u_off} AS user_id"))

    def rot(k: int) -> str:
        shifted = ALPHA[k % 26:] + ALPHA[:k % 26]
        return (f"doc_id + {k * d_off} AS doc_id, "
                f"translate(lower(text), '{ALPHA}', '{shifted}') AS text")

    inflate("documents", rot)
    l_off = mx("embeddings", "label")
    inflate("embeddings", lambda k: (
        f"vec_id + {k * d_off} AS vec_id, "
        f"(embedding[{k % 8 + 1}:] || embedding[1:{k % 8}])::FLOAT[] "
        f"AS embedding, "
        f"label + {k * l_off} AS label"))

    # region/nation are bounded dims BY DESIGN (5/25 rows at any SF) —
    # copying them unchanged is the honest 100 TB shape.
    for t in ("region", "nation"):
        shutil.copyfile(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=8)
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    out = OUT_TMPL.format(factor=args.factor)
    if args.rebuild and os.path.isdir(out):
        shutil.rmtree(out)
    if not os.path.isdir(out) or not os.listdir(out):
        print(f"# building {out} ({args.factor}x {BASE})", file=sys.stderr)
        build(BASE, out, args.factor)

    from stock_data_warehouse_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("scale_probe")
    qs = entry_mod.queries()
    fams = {f: q for f, q in FAMILIES.items()
            if not args.only or f in args.only.split(",")}

    spark.read.parquet(f"{BASE}/lineitem.parquet").count()
    spark.read.parquet(f"{out}/lineitem.parquet").count()

    results = {}
    for fam, name in fams.items():
        row: dict = {"query": name}
        for tag, d in (("base", BASE), ("scaled", out)):
            runs = []
            for _ in range(N_ITER):
                t0 = time.time()
                qs[name](spark, d)\
                    .write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            row[tag] = min(runs)
            row[f"{tag}_first"] = runs[0]
        row["ratio"] = round(row["scaled"] / row["base"], 2)
        row["ratio_per_x"] = round(row["ratio"] / args.factor, 3)
        results[fam] = row
        print(json.dumps({fam: row}), file=sys.stderr)

    record = json.dumps({
        "metric": "scale_probe",
        "factor": args.factor,
        "base": BASE,
        "families": results,
        "load_avg_1m": round(os.getloadavg()[0], 2),
        "iterations": N_ITER,
    })
    spark.stop()
    print(record, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
