"""Quiet-host fresh-session timing probe (the 'bloom protocol',
VERDICT r8/r9): one fresh SparkSession per process, warmup on
pricing_summary (absorbs JVM + codegen startup), then ONE timed
.collect() of each named query at sf0.1 / local[32]. Run this script
N times (median-of-5 is the standard) — repeat-run timings inside one
session are polluted by CacheManager sub-plan reuse, which is why
bench.py medians can't adjudicate plan-level regressions.

Usage: python tools/quiet_probe.py query [query ...]
Prints one JSON line {query: seconds}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E
from ingestion_scripts_spark.caching import release_caches
from ingestion_scripts_spark.session import build_session


def main() -> None:
    names = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    spark = build_session(
        app_name="quiet-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["pricing_summary"](spark, sf_dir).collect()
    release_caches()
    out = {}
    for name in names:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        out[name] = round(time.perf_counter() - t0, 3)
        release_caches()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
