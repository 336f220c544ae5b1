"""Optimization-round profiler: time named registry queries with the
bench methodology (collect, median-of-N on a bench-identical session) and
optionally dump their ``explain("formatted")`` plans.

Usage:
    python tools/profile_opt.py [--plans DIR] [--suffix _before] \
        [--runs 3] [--noop] query [query ...]

- ``--plans DIR``: write ``DIR/<query><suffix>.txt`` with the formatted plan.
- ``--noop``: time with the noop sink (guide §1.4) instead of collect —
  isolates computation from driver-side materialization; reported as a
  second number, never replacing the collect time (bench comparability).
"""

from __future__ import annotations

import io
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E
from ingestion_scripts_spark.caching import release_caches
from ingestion_scripts_spark.session import build_session


def main() -> None:
    args = sys.argv[1:]
    plans_dir = None
    suffix = "_before"
    runs = 3
    use_noop = False
    names = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--plans":
            plans_dir = args[i + 1]
            i += 2
        elif a == "--suffix":
            suffix = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--noop":
            use_noop = True
            i += 1
        else:
            names.append(a)
            i += 1

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    spark = build_session(
        app_name="profile-opt",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    # warmup, same as bench
    qs["pricing_summary"](spark, sf_dir).collect()

    for name in names:
        fn = qs[name]
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(plans_dir, f"{name}{suffix}.txt"), "w") as fh:
                fh.write(buf.getvalue())
            release_caches()
        samples = []
        for _ in range(runs):
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            samples.append(time.perf_counter() - t0)
            release_caches()
        med = statistics.median(samples)
        line = f"{name}: collect med={med:.3f}s ({', '.join(f'{s:.3f}' for s in samples)})"
        if use_noop:
            nsamples = []
            for _ in range(runs):
                spark.sparkContext.setJobDescription(f"profile-noop:{name}")
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                nsamples.append(time.perf_counter() - t0)
                release_caches()
            line += f" | noop med={statistics.median(nsamples):.3f}s"
        print(line, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
