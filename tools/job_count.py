"""Count Spark JOBS fired per registry query (one run each, bench-identical
session). At the bench SFs every query is overhead-dominated — tables are
KB-MB — so wall time tracks job count x fixed scheduling cost more than
bytes; this surfaces the queries whose kernels fire eager actions
(checkpoints, counts, collect loops) at build or execution time.

Usage: python tools/job_count.py query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from ingestion_scripts_spark.caching import release_caches
from ingestion_scripts_spark.session import build_session


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = build_session(
        app_name="job-count", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["pricing_summary"](spark, sf_dir).collect()  # warmup

    tracker = spark.sparkContext.statusTracker()
    for name in names:
        before = set(tracker.getJobIdsForGroup(None) or [])
        # include BUILD-time jobs (checkpoints etc.) in the count
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t_build = time.perf_counter() - t0
        df.collect()
        t_all = time.perf_counter() - t0
        after = set(tracker.getJobIdsForGroup(None) or [])
        release_caches()
        print(
            f"{name}: jobs={len(after - before)} build={t_build:.2f}s "
            f"total={t_all:.2f}s",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
