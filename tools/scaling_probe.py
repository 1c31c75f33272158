"""sf-scaling probe: measure how the heavy-hitter dedup queries scale
with input size, as evidence the 100 TB extrapolation in SCALE.md holds.

The driver testdata only varies `documents` between sf0.01 (500 rows)
and sf0.1 (5000 rows) — sf0.001 repeats the 500-row table — so the probe
builds intermediate scale points itself: it subsamples sf0.1's
documents.parquet to n ∈ {500, 1000, 2000, 5000} under /tmp (all other
tables symlinked from sf0.1), then times each query at every point
(best-of-R wall clock, warm session) and reports the scaling exponent b
in t ~ a + n^b:

- ``pairwise``: log-slope between consecutive points. The largest-n
  slope is the headline number — at small n, fixed per-job overhead
  (scheduling, Arrow round-trips, job setup) dominates the numerator
  and drags the exponent toward 0.
- ``fit``: least-squares slope over all points (same caveat baked into
  the small points).

b ≈ 1 is linear scale-out (embarrassingly parallel / partial-agg
shapes); b ≈ 1.2-1.4 at these sizes usually means an O(n log n) sort or
a candidate-pair set growing slightly superlinearly; b ≥ 2 is the
quadratic cliff SCALE.md claims the bucketed designs avoid.

Usage: python tools/scaling_probe.py [query ...]   (default: heavy set)
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

SRC_DIR = "/root/testdata/sf0.1"
WORK_DIR = "/tmp/scaling_probe"
POINTS = [500, 1000, 2000, 5000]
DEFAULT_QUERIES = ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs",
                   "dedup_survivors"]
RUNS = 2


def build_points(spark) -> dict[int, str]:
    """Materialize one sf-dir per scale point: documents subsampled to
    the first n doc_ids (prefix subset, so every smaller point is a
    strict subset of the larger — same data distribution), every other
    table symlinked from sf0.1."""
    docs = spark.read.parquet(os.path.join(SRC_DIR, "documents.parquet"))
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    dirs = {}
    for n in POINTS:
        d = os.path.join(WORK_DIR, f"n{n}")
        marker = os.path.join(d, "_COMPLETE")
        if not os.path.exists(marker):
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d)
            for f in os.listdir(SRC_DIR):
                if f != "documents.parquet":
                    os.symlink(os.path.join(SRC_DIR, f), os.path.join(d, f))
            cutoff = ids[n - 1]
            (docs.filter(docs.doc_id <= cutoff).coalesce(4)
             .write.mode("overwrite")
             .parquet(os.path.join(d, "documents.parquet")))
            open(marker, "w").close()
        dirs[n] = d
    return dirs


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
    dirs = build_points(spark)

    # Warm codegen/plan caches once so the smallest point isn't billed
    # the one-time session compilation cost (same rationale as bench.py).
    for q in queries:
        qmap[q](spark, dirs[POINTS[0]]).count()

    results: dict[str, list[float]] = {}
    for q in queries:
        ts = []
        for n in POINTS:
            best = float("inf")
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qmap[q](spark, dirs[n]).count()
                best = min(best, time.perf_counter() - t0)
            ts.append(best)
            print(f"# {q} @ n={n}: {best:.3f}s", file=sys.stderr)
        results[q] = ts

    hdr = " ".join(f"t({n}):>8s".replace(f"t({n}):>8s", f"{f't({n})':>8s}")
                   for n in POINTS)
    print(f"\n{'query':22s} {hdr} "
          + " ".join(f"{f'b({POINTS[i]}→{POINTS[i+1]})':>12s}"
                     for i in range(len(POINTS) - 1))
          + f" {'b(fit)':>7s}")
    for q, ts in results.items():
        pw = [math.log(ts[i + 1] / ts[i])
              / math.log(POINTS[i + 1] / POINTS[i])
              for i in range(len(ts) - 1)]
        xs = [math.log(n) for n in POINTS]
        ys = [math.log(t) for t in ts]
        xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
        fit = (sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys))
               / sum((x - xbar) ** 2 for x in xs))
        print(f"{q:22s} " + " ".join(f"{t:8.3f}" for t in ts) + " "
              + " ".join(f"{b:12.2f}" for b in pw) + f" {fit:7.2f}")


if __name__ == "__main__":
    main()
