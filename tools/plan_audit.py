"""Physical-plan audit: the scale-posture evidence, regenerated on demand.

For every headline query (bench.py's set) this prints a markdown table of
the plan facts that matter at 100 TB — shuffle (Exchange) count, join
strategies, whether the scan received pushed filters, and how much of the
plan runs inside whole-stage codegen — so plan regressions are visible as
a diff of PLAN_AUDIT.md, not a 2x surprise in a bench number.

Usage: python tools/plan_audit.py [--sf DIR] [> PLAN_AUDIT.md]
"""

from __future__ import annotations

import argparse
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--all", action="store_true",
                    help="audit every registered query (default: the "
                         "bench headline set)")
    args = ap.parse_args()

    from bench import HEADLINE
    from stock_data_warehouse_spark.session import get_spark
    from stock_data_warehouse_spark.streaming.jobs import (
        STREAM_ADMISSION,
    )
    import __spark_entry__ as entry_mod

    spark = get_spark("plan-audit")
    jvm = spark.sparkContext._jvm
    qs = entry_mod.queries()
    scope = "full catalog" if args.all else "headline queries"

    print(f"# PLAN AUDIT — {scope} at {args.sf}\n")
    print("Regenerate: `python tools/plan_audit.py [--all] "
          "> PLAN_AUDIT.md`.\n")
    print("Shuffles = data-moving exchanges (hash/range/single-partition)"
          " in the executed (post-AQE) plan; reused exchange subtrees and"
          " broadcast builds are broken out separately. Codegen = distinct"
          " whole-stage-codegen spans (`*(n)` markers). Stream admission ="
          " the maxFilesPerTrigger contract a streaming query runs under"
          " (streaming/jobs.STREAM_ADMISSION — 1000000 means the bounded"
          " one-batch oracle replay, 1 means per-file batches with a"
          " moving watermark); a silent flip between the two shows up"
          " here as a committed diff (VERDICT r5 item 7).\n")
    print("| query | shuffles | broadcasts | reused | joins "
          "| pushed filters | codegen spans | stream admission |")
    print("|---|---|---|---|---|---|---|---|")
    names = sorted(qs) if args.all else list(HEADLINE)
    for name in names:
        if name not in qs:
            continue
        try:
            df = qs[name](spark, args.sf)
            df.collect()  # drive AQE to the final plan
        except Exception as exc:  # audit must not die on one query
            print(f"| {name} | ERROR: {type(exc).__name__} "
                  "| | | | | | |")
            continue
        plan = df._jdf.queryExecution().executedPlan().toString()
        plan = plan.split("== Initial Plan ==")[0]
        n_shuffle = len(re.findall(
            r"(?<!Reused)Exchange (?:hashpartitioning|"
            r"rangepartitioning|SinglePartition)", plan))
        n_bcast = len(re.findall(
            r"(?<!Reused)Exchange \w*Broadcast", plan))
        n_reused = len(re.findall(r"ReusedExchange", plan))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin)", plan)))
        formatted = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        pushed = [m for m in re.findall(r"PushedFilters: \[([^\]]*)\]",
                                        formatted)
                  if m and m != ""]
        nontrivial = sum(1 for p in pushed
                         if any(k in p for k in
                                ("GreaterThan", "LessThan", "EqualTo",
                                 "StringContains", "In(")))
        n_wsc = len(set(re.findall(r"\*\((\d+)\)", plan)))
        join_s = ", ".join(j.replace("Join", "") for j in joins) or "—"
        adm = STREAM_ADMISSION.get(name)
        adm_s = str(adm) if adm is not None else "—"
        print(f"| {name} | {n_shuffle} | {n_bcast} | {n_reused} "
              f"| {join_s} "
              f"| {nontrivial} predicate / {len(pushed)} scans "
              f"| {n_wsc} | {adm_s} |")
    audited = [n for n in names if n in qs]
    print(f"\nAudited {len(audited)} of {len(qs)} registered queries.")
    if args.all and len(audited) != len(qs):
        print(f"ERROR: --all audit covered {len(audited)} != "
              f"{len(qs)} registered queries", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
