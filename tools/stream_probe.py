"""Per-trigger breakdown for the STREAMING registry queries (guide §1:
measure first). Attaches a StreamingQueryListener to a bench-identical
session, runs each named query once, and prints every micro-batch's
durationMs map (addBatch / getBatch / latestOffset / queryPlanning /
walCommit / commitOffsets) plus state-store metrics — the per-trigger
fixed costs the streaming latency models in the registry docstrings
attribute wall time to, now measured instead of asserted.

Usage: python tools/stream_probe.py stream_outer_join [more ...]
"""

from __future__ import annotations

import json
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
        app_name="stream-probe", master=f"local[{cpus}]",
        shuffle_partitions=cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    qs["pricing_summary"](spark, sf_dir).collect()  # warmup

    from pyspark.sql.streaming import StreamingQueryListener

    progress: list[dict] = []

    class _L(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            p = event.progress
            progress.append(json.loads(p.json))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    listener = _L()
    spark.streams.addListener(listener)

    for name in names:
        progress.clear()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        release_caches()
        # listener events are delivered asynchronously — drain briefly
        time.sleep(1.5)
        print(f"== {name}: wall={wall:.2f}s triggers={len(progress)}")
        for p in progress:
            dur = p.get("durationMs", {})
            rows = p.get("numInputRows", 0)
            ss = [
                {
                    k: op.get(k)
                    for k in (
                        "numRowsTotal",
                        "commitTimeMs",
                        "numShufflePartitions",
                        "numStateStoreInstances",
                    )
                }
                for op in p.get("stateOperators", [])
            ]
            print(
                f"  batch={p.get('batchId')} rows={rows} dur={dur} state={ss}",
                flush=True,
            )
    spark.streams.removeListener(listener)
    spark.stop()


if __name__ == "__main__":
    main()
