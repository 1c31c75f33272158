"""Isolated per-query minibench: the r13 A/B measurement protocol.

Fresh JVM, bench.py's exact session config, codegen warmed at sf0.001,
then best-of-R (default 3) wall-clock at the target scale with
``clearCache`` between reps — the number that is comparable ACROSS two
invocations of this script minutes apart on this host (full-bench
totals are not: after ~200 warmed plans the shared JVM's JIT/GC state
penalizes late queries by up to 3-4x, SCALE.md "Round-13").

Usage: python tools/minibench.py [sf_dir] query [query ...]
       MINIBENCH_RUNS=N to change the rep count (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args.pop(0) if args and "/" in args[0] else "/root/testdata/sf0.1"
    runs = int(os.environ.get("MINIBENCH_RUNS", "3"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("minibench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as ent

    qmap = ent.queries()
    warm_dir = "/root/testdata/sf0.001"
    timings: dict[str, float] = {}
    for name in args:
        fn = qmap.get(name)
        if fn is None:
            print(f"# unknown query {name}", file=sys.stderr)
            continue
        if os.path.isdir(warm_dir):
            fn(spark, warm_dir).count()
        best = float("inf")
        reps = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            dt = time.perf_counter() - t0
            reps.append(round(dt, 4))
            best = min(best, dt)
        timings[name] = round(best, 4)
        print(f"# {name}: {n} rows; best {timings[name]}s of {reps}",
              file=sys.stderr)
        leaked = spark.sparkContext._jsc.getPersistentRDDs()
        if leaked.size() > 0:
            spark.catalog.clearCache()
            for rid in list(leaked.keySet()):
                leaked.get(rid).unpersist(False)
    print(json.dumps({"queries": timings, "runs": runs, "sf_dir": sf_dir}))
    spark.stop()


if __name__ == "__main__":
    main()
