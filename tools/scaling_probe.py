"""sf-scaling probe: measure how the heavy-hitter dedup queries scale
with input size, as evidence the 100 TB extrapolation in SCALE.md holds.

Times each query at sf0.001 / sf0.01 / sf0.1 (best-of-R wall clock, warm
session) and reports the scaling exponent b in t ~ n^b two ways:

- ``pairwise``: log-slope between consecutive scale factors. The
  0.01→0.1 slope is the headline number — at sf0.001 fixed per-job
  overhead (scheduling, codegen-cached plan setup, Arrow round-trips)
  dominates the numerator and drags the exponent toward 0.
- ``fit``: least-squares slope over all points, reported with the
  caveat above baked into the smallest point.

b ≈ 1 is linear scale-out (embarrassingly parallel / partial-agg
shapes); b ≈ 1.2-1.4 at these sizes usually means an O(n log n) sort or
a candidate-pair set growing slightly superlinearly; b ≥ 2 is the
quadratic cliff SCALE.md claims the bucketed designs avoid.

Usage: python tools/scaling_probe.py [query ...]   (default: heavy set)
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]
DEFAULT_QUERIES = ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
                   "dedup_survivors"]
RUNS = 2

# Driver table each query's cost is keyed to (rows(sf) gives n for the fit).
SIZE_TABLE = "documents"


def main() -> None:
    queries = sys.argv[1:] or DEFAULT_QUERIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("scaling-probe")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as ent
    qmap = ent.queries()

    sizes = {}
    for d in SF_DIRS:
        sizes[d] = spark.read.parquet(
            os.path.join(d, f"{SIZE_TABLE}.parquet")).count()

    # Warm codegen/plan caches once so the smallest point isn't billed
    # the one-time session compilation cost (same rationale as bench.py).
    for q in queries:
        qmap[q](spark, SF_DIRS[0]).count()

    results: dict[str, dict[str, float]] = {}
    for q in queries:
        per_sf = {}
        for d in SF_DIRS:
            best = float("inf")
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qmap[q](spark, d).count()
                best = min(best, time.perf_counter() - t0)
            per_sf[d] = best
            print(f"# {q} @ {os.path.basename(d)}: {best:.3f}s "
                  f"(n={sizes[d]})", file=sys.stderr)
        results[q] = per_sf

    print(f"\n{'query':28s} {'t(0.001)':>9s} {'t(0.01)':>9s} {'t(0.1)':>9s} "
          f"{'b(.001→.01)':>12s} {'b(.01→.1)':>10s} {'b(fit)':>7s}")
    for q, per_sf in results.items():
        ts = [per_sf[d] for d in SF_DIRS]
        ns = [sizes[d] for d in SF_DIRS]
        pw = [math.log(ts[i + 1] / ts[i]) / math.log(ns[i + 1] / ns[i])
              for i in range(len(ts) - 1)]
        xs = [math.log(n) for n in ns]
        ys = [math.log(t) for t in ts]
        xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
        fit = (sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys))
               / sum((x - xbar) ** 2 for x in xs))
        print(f"{q:28s} {ts[0]:9.3f} {ts[1]:9.3f} {ts[2]:9.3f} "
              f"{pw[0]:12.2f} {pw[1]:10.2f} {fit:7.2f}")


if __name__ == "__main__":
    main()
