"""Count the Spark JOBS (eager actions) a query launches end to end.

Usage: python tools/job_count.py <query> [query ...]

Runs each named query exactly as the bench does (build + noop sink)
and reports how many Spark jobs the whole execution launched — the
action-count evidence for the foreachBatch streams, whose cost at
sf0.1 is dominated by the per-action floor (~0.08-0.4 s each,
OPTIMIZATION_r15.md "Measurement method") rather than data volume.
Job ids are globally monotonic in a SparkContext, so the count is
taken as the distance between two single-job markers run in the
default (group-less) job group — this also counts jobs the streaming
engine launches under its own job groups, which
``getJobIdsForGroup(None)`` alone would miss.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    names = sys.argv[1:]
    from stock_data_warehouse_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("job-count")
    sc = spark.sparkContext
    qs = entry_mod.queries()

    def marker_id() -> int:
        sc.range(1).count()
        return max(sc.statusTracker().getJobIdsForGroup(None))

    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()  # warm
    for name in names:
        lo = marker_id()
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        hi = marker_id()
        print(f"{name}: {hi - lo - 1} jobs")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
