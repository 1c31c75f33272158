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
                   "dedup_clusters",       # the LIVE clustering chain
                   # (dedup_survivors now serves from the at-rest label
                   # table — its scaling is the build, probed via
                   # dedup_clusters, plus an O(output) anti-join)
                   "sim_neardup_pairs", "sim_ivf_partitioned",
                   "ret_bm25_topk"]
# Queries scanning the embeddings table: capped at its row count (the
# driver ships 2000 embedding rows at sf0.1, vs 5000 documents).
EMB_QUERIES = {"sim_neardup_pairs", "sim_ivf_partitioned", "sim_cosine_topk",
               "sim_quantized_topk", "dedup_semantic_survivors",
               "graph_triangle_count", "graph_pagerank",
               "sim_random_projection", "sim_ivfpq_topk",
               "graph_edge_jaccard", "graph_personalized_pagerank",
               "graph_seed_distance"}
RUNS = 2


def build_points(spark) -> tuple[dict[int, str], int]:
    """Materialize one sf-dir per scale point: documents AND embeddings
    subsampled to the first n ids (prefix subset, so every smaller point
    is a strict subset of the larger — same data distribution; the
    embeddings table caps at its own size), every other table symlinked
    from sf0.1. Returns (dirs, embedding row count)."""
    docs = spark.read.parquet(os.path.join(SRC_DIR, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(SRC_DIR, "embeddings.parquet"))
    ids = [r[0] for r in docs.select("doc_id").orderBy("doc_id").collect()]
    eids = [r[0] for r in emb.select("vec_id").orderBy("vec_id").collect()]
    # Fact tables (events, lineitem+orders) subsample PROPORTIONALLY to
    # n/max(POINTS) by key prefix — same distribution per point, and the
    # order-key cutoff is shared between lineitem and orders so the
    # dq_ reconciliation/referential shapes stay internally consistent.
    events = spark.read.parquet(os.path.join(SRC_DIR, "events.parquet"))
    orders = spark.read.parquet(os.path.join(SRC_DIR, "orders.parquet"))
    li = spark.read.parquet(os.path.join(SRC_DIR, "lineitem.parquet"))
    max_event = events.agg({"event_id": "max"}).first()[0]
    max_order = orders.agg({"o_orderkey": "max"}).first()[0]
    dirs = {}
    for n in POINTS:
        d = os.path.join(WORK_DIR, f"n{n}")
        marker = os.path.join(d, "_COMPLETE_V3")
        if not os.path.exists(marker):
            shutil.rmtree(d, ignore_errors=True)
            os.makedirs(d)
            for f in os.listdir(SRC_DIR):
                if f not in ("documents.parquet", "embeddings.parquet",
                             "events.parquet", "orders.parquet",
                             "lineitem.parquet"):
                    os.symlink(os.path.join(SRC_DIR, f), os.path.join(d, f))
            cutoff = ids[n - 1]
            (docs.filter(docs.doc_id <= cutoff).coalesce(4)
             .write.mode("overwrite")
             .parquet(os.path.join(d, "documents.parquet")))
            ecut = eids[min(n, len(eids)) - 1]
            (emb.filter(emb.vec_id <= ecut).coalesce(4)
             .write.mode("overwrite")
             .parquet(os.path.join(d, "embeddings.parquet")))
            frac = n / float(max(POINTS))
            (events.filter(events.event_id <= int(max_event * frac))
             .coalesce(4).write.mode("overwrite")
             .parquet(os.path.join(d, "events.parquet")))
            ocut = int(max_order * frac)
            (orders.filter(orders.o_orderkey <= ocut).coalesce(4)
             .write.mode("overwrite")
             .parquet(os.path.join(d, "orders.parquet")))
            (li.filter(li.l_orderkey <= ocut).coalesce(4)
             .write.mode("overwrite")
             .parquet(os.path.join(d, "lineitem.parquet")))
            open(marker, "w").close()
        dirs[n] = d
    return dirs, len(eids)


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
    dirs, n_emb = build_points(spark)

    def points_for(q: str) -> list[int]:
        # Embedding-table queries stop scaling once the subsample hits
        # the table's full size — drop the flat points so their
        # exponents are never computed over a constant input.
        if q in EMB_QUERIES:
            pts = [n for n in POINTS if n <= n_emb]
            return pts or POINTS[:1]
        return POINTS

    # Warm codegen/plan caches once so the smallest point isn't billed
    # the one-time session compilation cost (same rationale as bench.py).
    for q in queries:
        qmap[q](spark, dirs[POINTS[0]]).count()

    results: dict[str, dict[int, float]] = {}
    for q in queries:
        ts: dict[int, float] = {}
        for n in points_for(q):
            best = float("inf")
            for _ in range(RUNS):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qmap[q](spark, dirs[n]).count()
                best = min(best, time.perf_counter() - t0)
            ts[n] = best
            print(f"# {q} @ n={n}: {best:.3f}s", file=sys.stderr)
        results[q] = ts

    hdr = " ".join(f"{f't({n})':>8s}" for n in POINTS)
    print(f"\n{'query':22s} {hdr} "
          + " ".join(f"{f'b({POINTS[i]}→{POINTS[i+1]})':>12s}"
                     for i in range(len(POINTS) - 1))
          + f" {'b(fit)':>7s}")
    for q, ts in results.items():
        pts = sorted(ts)
        tcols = " ".join(f"{ts[n]:8.3f}" if n in ts else f"{'-':>8s}"
                         for n in POINTS)
        pw = []
        for i in range(len(POINTS) - 1):
            a, b = POINTS[i], POINTS[i + 1]
            if a in ts and b in ts:
                pw.append(f"{math.log(ts[b] / ts[a]) / math.log(b / a):12.2f}")
            else:
                pw.append(f"{'-':>12s}")
        xs = [math.log(n) for n in pts]
        ys = [math.log(ts[n]) for n in pts]
        xbar, ybar = sum(xs) / len(xs), sum(ys) / len(ys)
        denom = sum((x - xbar) ** 2 for x in xs)
        fit = (sum((x - xbar) * (y - ybar) for x, y in zip(xs, ys)) / denom
               if denom else float("nan"))
        print(f"{q:22s} {tcols} " + " ".join(pw) + f" {fit:7.2f}")


if __name__ == "__main__":
    main()
