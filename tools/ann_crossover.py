"""ANN crossover probe: where does the quantized coarse-scan + exact
rescore start beating brute force end to end?

Builds scaled embedding corpora by replicating sf0.1's 5000 vectors
with id offsets (identical vector values — this probes SCAN/compute
cost, not recall, which the registry's recall queries measure on real
data), materializes the uint8 codes table at rest for each size, and
times both plans per corpus size. Evidence for SCALE.md's claim that
the sf0.1 gap is fixed job overhead that inverts with size.

Usage: python tools/ann_crossover.py [sizes...]   (default 5k..200k)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1/embeddings.parquet"
WORK = "/tmp/ann_crossover"
SIZES = [5_000, 20_000, 50_000, 100_000, 200_000]
RUNS = 3


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or SIZES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName("ann-crossover")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory",
                     os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from openedx_event_sink_clickhouse_spark.operators.similarity import (
        brute_force_topk, quantized_cosine_topk, write_quantized_codes)

    base = spark.read.parquet(SRC).select("vec_id", "embedding")
    n0 = base.count()
    import pyarrow.parquet as pq
    probe_vec = pq.read_table(SRC, filters=[("vec_id", "=", 0)],
                              columns=["embedding"]) \
        .column("embedding")[0].as_py()

    print(f"{'n':>8s} {'brute':>8s} {'quantized':>10s} {'ratio':>6s}")
    for n in sizes:
        reps = (n + n0 - 1) // n0
        d = os.path.join(WORK, f"n{n}")
        if not os.path.isfile(os.path.join(d, "emb", "_SUCCESS")):
            rep = spark.range(reps).select(F.col("id").alias("rep"))
            emb = (base.crossJoin(rep)
                   .select((F.col("vec_id") + F.col("rep") * n0)
                           .alias("vec_id"), "embedding")
                   .filter(F.col("vec_id") < n))
            emb.write.mode("overwrite").parquet(os.path.join(d, "emb"))
            write_quantized_codes(spark.read.parquet(os.path.join(d, "emb")),
                                  os.path.join(d, "codes"))
        emb = spark.read.parquet(os.path.join(d, "emb"))
        codes = spark.read.parquet(os.path.join(d, "codes"))

        def best(f):
            t = float("inf")
            f()
            for _ in range(RUNS):
                t0 = time.perf_counter()
                f()
                t = min(t, time.perf_counter() - t0)
            return t

        tb = best(lambda: brute_force_topk(emb, 0, k=10).count())
        tq = best(lambda: quantized_cosine_topk(
            emb, 0, k=10, rescore_factor=5, codes=codes,
            probe_vec=probe_vec).count())
        print(f"{n:8d} {tb:8.3f} {tq:10.3f} {tq / tb:6.2f}")


if __name__ == "__main__":
    main()
