"""Similarity search over an embedding column (north-star extension).

Three tiers, trading recall for scan cost:

- **Brute force** — probe broadcast against the full corpus: one narrow
  map pass, exact. The baseline every ANN variant is graded against, and
  at 100 TB still the right plan when the QUERY side is small (corpus
  streams, no shuffle).
- **IVF** (inverted-file) — corpus pre-partitioned by nearest coarse
  centroid; a probe searches only its cell. Cuts the scanned fraction to
  ~1/n_centroids. Centroids here are the first K vectors (deterministic,
  so the DuckDB oracle can reproduce the partitioning); production would
  plug k-means centroids into the same plan.
- **Random-hyperplane LSH** (sign-random-projection) — bit signature per
  vector; same-bucket vectors are candidates. Planes are md5-derived
  constants, so signatures are reproducible everywhere.

All cosine math in double via ``functions/vectors.py`` (bit-identical to
DuckDB). Results carry ``round(..., 6)`` display values but are RANKED on
full precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashes import md5_hash32
from ..functions.vectors import as_double, cosine, cosine_with_norms, l2_norm


def _probe(emb: DataFrame, probe_id, id_col: str, vec_col: str) -> DataFrame:
    return (emb.filter(F.col(id_col) == probe_id)
            .select(as_double(F.col(vec_col)).alias("probe_vec"),
                    l2_norm(as_double(F.col(vec_col))).alias("probe_norm")))


def brute_force_topk(emb: DataFrame, probe_id, k: int = 20,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     ) -> DataFrame:
    """Exact cosine top-k vs one probe vector. Broadcast of a single row;
    ranking ties broken by id for determinism. The probe's norm ships in
    the broadcast, so the corpus pass runs two array aggregates per row
    (dot + own norm), not three."""
    scored = (emb.filter(F.col(id_col) != probe_id)
              .select(F.col(id_col), as_double(F.col(vec_col)).alias("v"))
              .crossJoin(F.broadcast(_probe(emb, probe_id, id_col, vec_col)))
              .select(F.col(id_col),
                      cosine_with_norms(F.col("v"), F.col("probe_vec"),
                                        l2_norm(F.col("v")),
                                        F.col("probe_norm")).alias("_cos")))
    return (scored.orderBy(F.desc("_cos"), id_col).limit(k)
            .select(id_col, F.round("_cos", 6).alias("cosine_sim")))


def cosine_neardup_pairs(emb: DataFrame, threshold: float,
                         block_col: str = "label", id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Embedding near-dup pairs with cosine ≥ threshold, blocked on a
    coarse key so the self-join is per-block instead of full cross —
    the same blocking pattern IVF/LSH generalize. Returns
    (id_a, id_b, cosine_sim)."""
    v = as_double(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"),
                      l2_norm(v).alias("nv"),
                      F.col(block_col).alias("blk"))
    a, b = base.alias("a"), base.alias("b")
    # Norms hoisted to once per vector (bit-identical hoist): each
    # candidate pair costs one dot-product pass, not three aggregates.
    sim = cosine_with_norms(F.col("a.v"), F.col("b.v"),
                            F.col("a.nv"), F.col("b.nv"))
    return (a.join(b, (F.col("a.blk") == F.col("b.blk")) &
                      (F.col("a.id") < F.col("b.id")))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    sim.alias("_cos"))
            .filter(F.col("_cos") >= threshold)
            .select("id_a", "id_b", F.round("_cos", 6).alias("cosine_sim")))


def ivf_assign(emb: DataFrame, n_centroids: int = 16, id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its max-cosine coarse centroid (centroid set
    = the first ``n_centroids`` vectors by id). Returns (id, v, centroid).

    Plan: corpus ⋈ broadcast(centroids) → per-vector argmax via one
    window; the corpus is scanned once. At scale the assignment is
    computed at ingest and stored as a partition column — queries then
    prune to one cell for free.
    """
    v = as_double(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"),
                      l2_norm(v).alias("nv"))
    cents = (base.filter(F.col("id") < n_centroids)
             .select(F.col("id").alias("cid"), F.col("v").alias("cv"),
                     F.col("nv").alias("cnv")))
    scored = (base.crossJoin(F.broadcast(cents))
              .select("id", "v", "nv", "cid",
                      cosine_with_norms(F.col("v"), F.col("cv"),
                                        F.col("nv"), F.col("cnv"))
                      .alias("_cos")))
    w = Window.partitionBy("id").orderBy(F.desc("_cos"), F.col("cid"))
    return (scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", "v", "nv", F.col("cid").alias("centroid")))


def ivf_topk(emb: DataFrame, probe_id, k: int = 20, n_centroids: int = 16,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF search: exact cosine top-k within the probe's centroid cell
    (nprobe=1). Scans ~1/n_centroids of the corpus."""
    assigned = ivf_assign(emb, n_centroids, id_col, vec_col)
    probe = (assigned.filter(F.col("id") == probe_id)
             .select(F.col("v").alias("probe_vec"),
                     F.col("nv").alias("probe_norm"),
                     F.col("centroid").alias("probe_centroid")))
    cell = (assigned.crossJoin(F.broadcast(probe))
            .filter((F.col("centroid") == F.col("probe_centroid")) &
                    (F.col("id") != probe_id)))
    scored = cell.select(
        F.col("id").alias(id_col),
        cosine_with_norms(F.col("v"), F.col("probe_vec"),
                          F.col("nv"), F.col("probe_norm")).alias("_cos"))
    return (scored.orderBy(F.desc("_cos"), id_col).limit(k)
            .select(id_col, F.round("_cos", 6).alias("cosine_sim")))


def multi_probe_topk(emb: DataFrame, n_probes: int = 10, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     ) -> DataFrame:
    """Batch ANN workload: exact cosine top-k for EVERY probe in a probe
    set (ids < n_probes) against the rest of the corpus. Returns
    (probe_id, vec_id, rank, cosine_sim).

    Plan: probe set (with precomputed norms) broadcasts; the corpus
    streams through one map pass scoring all probes per row; per-probe
    ranking is a window partitioned BY PROBE — k small and n_probes
    bounded, so state per window is tiny and the only shuffle is
    (probe_id)-partitioned scored candidates. At 100 TB with millions of
    probes this flips to the IVF/LSH-bucketed plans; the window shape is
    unchanged."""
    base = emb.select(F.col(id_col).alias("id"),
                      as_double(F.col(vec_col)).alias("v"))
    probes = (base.filter(F.col("id") < n_probes)
              .select(F.col("id").alias("probe_id"),
                      F.col("v").alias("pv"),
                      l2_norm(F.col("v")).alias("pn")))
    corpus = (base.filter(F.col("id") >= n_probes)
              .withColumn("nv", l2_norm(F.col("v"))))
    scored = (corpus.crossJoin(F.broadcast(probes))
              .select("probe_id", F.col("id").alias(id_col),
                      cosine_with_norms(F.col("v"), F.col("pv"),
                                        F.col("nv"), F.col("pn"))
                      .alias("_cos")))
    w = Window.partitionBy("probe_id").orderBy(F.desc("_cos"), F.col(id_col))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", id_col, "rank",
                    F.round("_cos", 6).alias("cosine_sim")))


def srp_planes(num_planes: int, dim: int) -> list[list[float]]:
    """Deterministic random hyperplanes: component (p, d) is an md5-derived
    uniform in [-1, 1). Plain Python — these are plan-time constants
    embedded as literals in both engines."""
    import hashlib
    out = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = int(hashlib.md5(f"plane{p}:{d}".encode()).hexdigest()[:8], 16)
            row.append(h / 2**31 - 1.0)
        out.append(row)
    return out


def srp_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Bit signature: bit p = 1 iff dot(v, plane_p) > 0."""
    bits = []
    for p, plane in enumerate(planes):
        dot_p = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(x) for x in plane]),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        bits.append(F.when(dot_p > 0, F.lit(1 << p).cast("bigint"))
                     .otherwise(F.lit(0).cast("bigint")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def srp_bucket_topk(emb: DataFrame, probe_id, k: int = 20,
                    num_planes: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> DataFrame:
    """LSH-bucketed ANN: exact cosine top-k among vectors sharing the
    probe's sign-random-projection bucket. ~1/2^num_planes of the corpus
    scanned; recall tunable via fewer planes / multiple tables."""
    dim = len(emb.select(vec_col).first()[0])
    planes = srp_planes(num_planes, dim)
    v = as_double(F.col(vec_col))
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"),
                      l2_norm(v).alias("nv"))
    sigs = base.withColumn("bucket", srp_signature(F.col("v"), planes))
    probe = (sigs.filter(F.col("id") == probe_id)
             .select(F.col("v").alias("probe_vec"),
                     F.col("nv").alias("probe_norm"),
                     F.col("bucket").alias("probe_bucket")))
    cell = (sigs.join(F.broadcast(probe),
                      (F.col("bucket") == F.col("probe_bucket")) &
                      (F.col("id") != probe_id)))
    scored = cell.select(F.col("id").alias(id_col),
                         cosine_with_norms(F.col("v"), F.col("probe_vec"),
                                           F.col("nv"), F.col("probe_norm"))
                         .alias("_cos"))
    return (scored.orderBy(F.desc("_cos"), id_col).limit(k)
            .select(id_col, F.round("_cos", 6).alias("cosine_sim")))
