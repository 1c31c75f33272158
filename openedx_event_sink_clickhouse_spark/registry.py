"""Query registry: every implemented operator as a named
``(spark, sf_dir) -> DataFrame`` callable plus its DuckDB oracle SQL.

``__spark_entry__.queries()``/``oracle_sql()`` are thin views over this.
Each entry exercises one operator from SURVEY.md §2 (or one greenfield
extension) against the driver's synthetic tables. Column aliases are kept
identical between the Spark plan and the SQL so the driver's
order-insensitive value-hash comparison is meaningful.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.derivations import (
    deterministic_dump_id,
    deterministic_dump_id_sql,
    json_pack,
    bool_flag,
    member_flag,
    normalize_apostrophes,
    strip_branch_and_version,
)
from .functions.text import shingles_sql
from .operators import joins, scans
from .operators.incremental import watermarks
from .plans.pipelines import flagship_events_incremental
from .session import tune_session
from .sources.tables import load_table

# Cutoff splitting events into "already dumped" vs "new" for the flagship
# incremental-load scenario (events span 2024-01; early cutoff ≈ 1/3 new).
FLAGSHIP_CUTOFF = "2024-01-05 00:00:00"

REGISTRY: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)
        REGISTRY[name] = (wrapped, sql)
        return wrapped
    return deco


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


# --------------------------------------------------------------------------
# Flagship (EP3 pipeline: A1 + A2 + P1-P5 composed)
# --------------------------------------------------------------------------

@register("flagship_incremental_dump", f"""
WITH wm AS (
  SELECT user_id AS entity_id, max(ts) AS last_dump
  FROM events WHERE ts < TIMESTAMP '{FLAGSHIP_CUTOFF}'
  GROUP BY user_id
)
SELECT
  e.event_id, e.user_id, e.event_type, e.ts AS modified,
  json_object('event_type', e.event_type, 'value', e.value,
              'props', e.props) AS event_data_json,
  {deterministic_dump_id_sql('e.event_id')} AS dump_id,
  TIMESTAMP '{FLAGSHIP_CUTOFF}' AS time_last_dumped
FROM events e
LEFT JOIN wm ON e.user_id = wm.entity_id
WHERE wm.last_dump IS NULL OR e.ts > wm.last_dump
""")
def _flagship(spark, sf_dir):
    return flagship_events_incremental(_t(spark, sf_dir, "events"), FLAGSHIP_CUTOFF)


# --------------------------------------------------------------------------
# S1-S6: scans & filters (base_sink.py:159-167,220-224,284-306)
# --------------------------------------------------------------------------

@register("s1_full_scan", "SELECT * FROM nation")
def _s1(spark, sf_dir):
    return scans.full_scan(_t(spark, sf_dir, "nation"))


@register("s2_range_scan",
          "SELECT * FROM orders WHERE o_orderkey > 1200")
def _s2(spark, sf_dir):
    return scans.range_scan(_t(spark, sf_dir, "orders"), "o_orderkey", 1200)


@register("s3_in_list_filter",
          "SELECT * FROM customer WHERE c_custkey IN (1, 5, 7, 11, 42)")
def _s3(spark, sf_dir):
    return scans.in_list(_t(spark, sf_dir, "customer"), "c_custkey", [1, 5, 7, 11, 42])


@register("s4_not_in_filter",
          "SELECT * FROM supplier WHERE s_suppkey NOT IN (1, 2, 3)")
def _s4(spark, sf_dir):
    return scans.not_in_list(_t(spark, sf_dir, "supplier"), "s_suppkey", [1, 2, 3])


@register("s5_limit_after_filter", """
SELECT * FROM orders WHERE o_orderstatus = 'O'
ORDER BY o_orderkey LIMIT 50
""")
def _s5(spark, sf_dir):
    # L1 semantics: limit applies AFTER the eligibility filter
    # (dump_data_to_clickhouse.py:70-74); ordered so the top-n is stable.
    filtered = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return scans.limited(filtered, 50, order_by="o_orderkey")


@register("s6_point_lookup", "SELECT * FROM part WHERE p_partkey = 42")
def _s6(spark, sf_dir):
    return scans.point_lookup(_t(spark, sf_dir, "part"), "p_partkey", 42)


# --------------------------------------------------------------------------
# S7-S9: joins (user_profile_sink.py:18-19, external_id_sink.py:18-19,
# utils.py:62-68)
# --------------------------------------------------------------------------

@register("s7_dim_enrich_join", """
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name AS nation_name
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
""")
def _s7(spark, sf_dir):
    out = joins.enrich(_t(spark, sf_dir, "customer"), _t(spark, sf_dir, "nation"),
                       "c_nationkey", "n_nationkey", {"n_name": "nation_name"})
    return out.select("c_custkey", "c_name", "c_acctbal", "nation_name")


@register("s8_double_dim_join", """
SELECT s.s_suppkey, s.s_name, n.n_name AS nation_name, r.r_name AS region_name
FROM supplier s
LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
""")
def _s8(spark, sf_dir):
    step1 = joins.enrich(_t(spark, sf_dir, "supplier"), _t(spark, sf_dir, "nation"),
                         "s_nationkey", "n_nationkey",
                         {"n_name": "nation_name", "n_regionkey": "n_regionkey"})
    step2 = joins.enrich(step1, _t(spark, sf_dir, "region"),
                         "n_regionkey", "r_regionkey", {"r_name": "region_name"})
    return step2.select("s_suppkey", "s_name", "nation_name", "region_name")


@register("s9_parent_child_expand", """
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, o.o_orderdate
FROM lineitem l
JOIN (SELECT o_orderkey, o_orderdate FROM orders WHERE o_orderstatus = 'F') o
  ON l.l_orderkey = o.o_orderkey
""")
def _s9(spark, sf_dir):
    parents = (_t(spark, sf_dir, "orders")
               .filter(F.col("o_orderstatus") == "F")
               .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"))
    out = joins.expand_children(parents, _t(spark, sf_dir, "lineitem"), "l_orderkey")
    return out.select("l_orderkey", "l_linenumber", "l_quantity", "o_orderdate")


# --------------------------------------------------------------------------
# P1-P8: projection & derived columns (serializers.py, course_published.py)
# --------------------------------------------------------------------------

@register("p1_projection_rename", """
SELECT o_orderkey AS pk, o_orderdate AS course_start,
       o_orderpriority AS priority, o_totalprice AS total
FROM orders
""")
def _p1(spark, sf_dir):
    # P1: fixed column list + rename via source= (serializers.py:44-66).
    return _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderdate").alias("course_start"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").alias("total"),
    )


@register("p2_p3_dump_metadata", f"""
SELECT o_orderkey,
       {deterministic_dump_id_sql('o_orderkey')} AS dump_id,
       TIMESTAMP '2024-02-01 00:00:00' AS time_last_dumped
FROM orders
""")
def _p2(spark, sf_dir):
    # P2/P3 oracle-checkable form: dump_id derived from the key, ingest
    # time pinned. Production paths use uuid4-per-batch + now() via
    # functions.derivations.dump_id_expr / ingest_timestamp.
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        deterministic_dump_id(F.col("o_orderkey")).alias("dump_id"),
        F.lit("2024-02-01 00:00:00").cast("timestamp").alias("time_last_dumped"),
    )


@register("p4_json_pack", """
SELECT p_partkey,
       json_object('brand', p_brand, 'type', p_type, 'size', p_size,
                   'retail_price', p_retailprice) AS part_data_json
FROM part
""")
def _p4(spark, sf_dir):
    return _t(spark, sf_dir, "part").select(
        "p_partkey",
        json_pack(brand=F.col("p_brand"), type=F.col("p_type"),
                  size=F.col("p_size"),
                  retail_price=F.col("p_retailprice")).alias("part_data_json"),
    )


@register("p5_casts_flags", """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS returned_flag,
       CAST(l_quantity AS BIGINT) AS quantity_int,
       CAST(l_orderkey AS VARCHAR) AS orderkey_str
FROM lineitem
""")
def _p5(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        bool_flag(F.col("l_returnflag") == "R").alias("returned_flag"),
        F.col("l_quantity").cast("bigint").alias("quantity_int"),
        F.col("l_orderkey").cast("string").alias("orderkey_str"),
    )


@register("p6_string_normalize", """
SELECT c_custkey,
       replace('it’s ' || c_name, '’', '''') AS display_name
FROM customer
""")
def _p6(spark, sf_dir):
    # P6: typographic-apostrophe normalization (course_published.py:119),
    # exercised on a synthesized display name containing one.
    return _t(spark, sf_dir, "customer").select(
        "c_custkey",
        normalize_apostrophes(
            F.concat(F.lit("it’s "), F.col("c_name"))).alias("display_name"),
    )


@register("p7_strip_branch_version", """
SELECT o_orderkey,
       regexp_replace(
         'block-v1:org+course+run+type@vertical+branch@draft+version@abc'
           || CAST(o_orderkey AS VARCHAR) || '+block@b' || CAST(o_orderkey AS VARCHAR),
         '\\+(branch|version)@[^+]*', '', 'g') AS location
FROM orders
""")
def _p7(spark, sf_dir):
    # P7: canonical usage key (course_published.py:129-137) over
    # synthesized locations carrying branch+version decorations.
    raw = F.concat(
        F.lit("block-v1:org+course+run+type@vertical+branch@draft+version@abc"),
        F.col("o_orderkey").cast("string"),
        F.lit("+block@b"), F.col("o_orderkey").cast("string"))
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey", strip_branch_and_version(raw).alias("location"))


@register("p8_member_flag", """
SELECT event_id, event_type,
       CASE WHEN event_type IN ('error', 'purchase') THEN 1 ELSE 0 END AS flagged
FROM events
""")
def _p8(spark, sf_dir):
    # P8: DETACHED_XBLOCK_TYPES-style set membership (utils.py:50-59).
    ev = _t(spark, sf_dir, "events")
    return ev.select("event_id", "event_type",
                     member_flag(F.col("event_type"), ("error", "purchase"))
                     .alias("flagged"))


# --------------------------------------------------------------------------
# T1-T3: hierarchy operators (course_published.py:47-94, base_sink.py:184-203)
# --------------------------------------------------------------------------

@register("t1_tree_ordinals", """
WITH totals AS (
  SELECT event_id, user_id, event_type,
    sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
      OVER w AS sec_total,
    sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      OVER w AS sub_total,
    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      OVER w AS unit_total
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, event_type,
  CAST(sec_total AS INT) AS section,
  CAST(sub_total - coalesce(
    last_value(CASE WHEN event_type = 'signup' THEN sub_total END IGNORE NULLS)
      OVER w, 0) AS INT) AS subsection,
  CAST(unit_total - coalesce(
    last_value(CASE WHEN event_type IN ('signup', 'view') THEN unit_total END
               IGNORE NULLS) OVER w, 0) AS INT) AS unit
FROM totals
WINDOW w AS (PARTITION BY user_id ORDER BY event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""")
def _t1(spark, sf_dir):
    # T1 exercised on the events stream: each user's event history is a
    # "course tree" where signup opens a section, view a subsection, click
    # a unit — same counter semantics as course_published.py:75-87.
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    from .operators.tree import tree_ordinals
    return tree_ordinals(ev, partition_key="user_id", order_col="event_id",
                         type_col="event_type", section_type="signup",
                         subsection_type="view", unit_type="click")


@register("t2_last_wins_dedup", """
SELECT user_id, event_type, event_id, ts, value, props
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY event_id DESC) = 1
""")
def _t2(spark, sf_dir):
    # T2: later traversal index wins (course_published.py:90-94) — here
    # the latest event per (user, type).
    from .operators.tree import last_wins_dedup
    return last_wins_dedup(_t(spark, sf_dir, "events"),
                           ["user_id", "event_type"], "event_id")


@register("t3_fan_out_metadata", f"""
SELECT l.l_orderkey, l.l_linenumber, l.l_quantity,
       {deterministic_dump_id_sql('o.o_orderkey')} AS dump_id,
       o.o_orderdate AS time_last_dumped
FROM lineitem l
JOIN (SELECT o_orderkey, o_orderdate FROM orders) o
  ON l.l_orderkey = o.o_orderkey
""")
def _t3(spark, sf_dir):
    # T3: children inherit the parent dump's lineage metadata
    # (base_sink.py:184-203); dump_id made deterministic for the oracle.
    from .operators.tree import fan_out
    parents = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        deterministic_dump_id(F.col("o_orderkey")).alias("dump_id"),
        F.col("o_orderdate").alias("time_last_dumped"))
    children = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity")
    return fan_out(parents, children, "l_orderkey",
                   {"dump_id": "dump_id", "time_last_dumped": "time_last_dumped"})


# --------------------------------------------------------------------------
# A1/A3: aggregates (base_sink.py:314-335, user_retire.py:33-34)
# --------------------------------------------------------------------------

@register("a1_watermarks", """
SELECT user_id AS entity_id, max(ts) AS last_dump
FROM events GROUP BY user_id
""")
def _a1(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").withColumnRenamed("user_id", "entity_id")
    return watermarks(ev, "entity_id", "ts")


@register("a3_distinct_sorted_ids",
          "SELECT DISTINCT user_id FROM events")
def _a3(spark, sf_dir):
    # user_retire.py:33-34 builds a sorted distinct id set; the sort is a
    # presentation detail (hash compare is order-insensitive).
    return _t(spark, sf_dir, "events").select("user_id").distinct()


# --------------------------------------------------------------------------
# D1: PII retirement delete-as-anti-join (user_retire.py:23-49)
# --------------------------------------------------------------------------

RETIRED_USER_IDS = (3, 17, 42, 99)


@register("d1_retire_users", f"""
SELECT * FROM events
WHERE user_id NOT IN ({", ".join(map(str, RETIRED_USER_IDS))})
""")
def _d1(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    retired = spark.createDataFrame([(i,) for i in RETIRED_USER_IDS], ["user_id"])
    return scans.semi_join_ids(ev, "user_id", retired, anti=True)


# --------------------------------------------------------------------------
# Dedup suite (operators/dedup.py) — training-data-pipeline extensions
# --------------------------------------------------------------------------

def _minhash_sql_exprs(num_hashes=12, bands=4, rows=3):
    # Mirrors operators/dedup.py: one md5 base hash per shingle (the `hv`
    # CTE column), then affine universal-hash families (a·h+b) mod 2^31−1.
    from .operators.dedup import MERSENNE31, MINHASH_PARAMS
    mins = ", ".join(
        f"list_min(list_transform(hv, h -> (h * {a} + {b}) % {MERSENNE31}))"
        for a, b in MINHASH_PARAMS[:num_hashes])
    band_hashes = ", ".join(
        "md5(" + " || ',' || ".join(
            f"CAST(sig[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows))
        + ")" for b in range(bands))
    return mins, band_hashes


@register("dedup_exact", """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id,
       count(*) AS n_copies
FROM documents GROUP BY md5(text)
""")
def _dd1(spark, sf_dir):
    from .operators.dedup import exact_dedup
    return exact_dedup(_t(spark, sf_dir, "documents"))


_MINS, _BANDS = _minhash_sql_exprs(num_hashes=16, bands=8, rows=2)

@register("dedup_minhash_lsh", f"""
WITH base AS (
  SELECT doc_id AS id, {shingles_sql('text')} AS sh
  FROM documents
), nonempty AS (
  SELECT * FROM base WHERE len(sh) > 0
), hashed AS (
  SELECT id, sh,
         list_transform(sh, x -> CAST('0x' || substr(md5(x), 1, 8) AS BIGINT))
           AS hv
  FROM nonempty
), sigs AS (
  SELECT id, sh, [{_MINS}] AS sig FROM hashed
), banded AS (
  SELECT id, sh, unnest([{_BANDS}]) AS band_hash,
         unnest(generate_series(0, 7)) AS band_idx
  FROM sigs
), pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM banded a JOIN banded b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash
   AND a.id < b.id
)
SELECT p.id_a, p.id_b,
       round(len(list_intersect(x.sh, y.sh))::DOUBLE /
             len(list_distinct(x.sh || y.sh)), 6) AS jaccard_sim
FROM pairs p
JOIN nonempty x ON p.id_a = x.id
JOIN nonempty y ON p.id_b = y.id
WHERE len(list_intersect(x.sh, y.sh))::DOUBLE /
      len(list_distinct(x.sh || y.sh)) >= 0.6
""")
def _dd2(spark, sf_dir):
    from .operators.dedup import minhash_lsh_pairs
    return minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.6)


@register("dedup_simhash", """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
), h AS (
  SELECT doc_id, CAST('0x' || substr(md5(w || '#0'), 1, 8) AS BIGINT) AS hv
  FROM toks
), bits AS (
  SELECT doc_id, j, sum(2 * ((hv >> j) & 1) - 1) AS tally
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j) js
  GROUP BY doc_id, j
)
SELECT doc_id,
       CAST(sum(CASE WHEN tally > 0 THEN (CAST(1 AS BIGINT) << j)
                     ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY doc_id
""")
def _dd3(spark, sf_dir):
    from .operators.dedup import simhash
    return simhash(_t(spark, sf_dir, "documents"))


@register("dedup_simhash_pairs", """
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents
), h AS (
  SELECT doc_id, CAST('0x' || substr(md5(w || '#0'), 1, 8) AS BIGINT) AS hv
  FROM toks
), bits AS (
  SELECT doc_id, j, sum(2 * ((hv >> j) & 1) - 1) AS tally
  FROM h CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS j) js
  GROUP BY doc_id, j
), sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN tally > 0 THEN (CAST(1 AS BIGINT) << j)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
), banded AS (
  SELECT doc_id, simhash,
         unnest(generate_series(0, 3)) AS band_idx,
         unnest([simhash & 255, (simhash >> 8) & 255,
                 (simhash >> 16) & 255, (simhash >> 24) & 255]) AS band_val
  FROM sigs
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM banded a JOIN banded b
  ON a.band_idx = b.band_idx AND a.band_val = b.band_val
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
""")
def _dd4(spark, sf_dir):
    # Banding is a pigeonhole-exact candidate filter here (hamming ≤ 3
    # over 4 bands ⇒ ≥ 1 identical band), so the SQL twin reproduces the
    # pair set exactly.
    from .operators.dedup import simhash, simhash_near_pairs
    sigs = simhash(_t(spark, sf_dir, "documents"))
    return simhash_near_pairs(sigs, max_hamming=3)


@register("dedup_ngram_jaccard", f"""
WITH base AS (
  SELECT doc_id, {shingles_sql('text')} AS sh
  FROM documents
), nonempty AS (SELECT * FROM base WHERE len(sh) > 0),
probe AS (SELECT sh AS psh FROM nonempty WHERE doc_id = 0)
SELECT d.doc_id,
       round(len(list_intersect(d.sh, probe.psh))::DOUBLE /
             len(list_distinct(d.sh || probe.psh)), 6) AS jaccard_sim
FROM nonempty d, probe
WHERE d.doc_id <> 0
""")
def _dd5(spark, sf_dir):
    from .operators.dedup import ngram_jaccard_vs_probe
    return ngram_jaccard_vs_probe(_t(spark, sf_dir, "documents"), probe_id=0)


def _cluster_oracle_sql() -> str:
    # the minhash pair query embedded as a CTE; cluster id = min reachable
    # node via a recursive transitive closure (DuckDB WITH RECURSIVE)
    return f"""
WITH RECURSIVE
pairs AS ({REGISTRY['dedup_minhash_lsh'][1]}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach(id, label) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
)
SELECT id AS doc_id, min(label) AS cluster_id,
       (id = min(label)) AS is_survivor
FROM reach GROUP BY id
"""


@register("dedup_clusters", None)  # oracle attached below (needs minhash SQL)
def _ddc(spark, sf_dir):
    from .operators.dedup import connected_components, minhash_lsh_pairs
    pairs = minhash_lsh_pairs(_t(spark, sf_dir, "documents"), threshold=0.6)
    return connected_components(pairs)


# attach after definition: the oracle embeds dedup_minhash_lsh's SQL,
# which must already be registered
REGISTRY["dedup_clusters"] = (REGISTRY["dedup_clusters"][0],
                              _cluster_oracle_sql())


# --------------------------------------------------------------------------
# Similarity search over embeddings (operators/similarity.py)
# --------------------------------------------------------------------------

def _cos_sql(a: str, b: str) -> str:
    from .functions.vectors import cosine_sql
    return cosine_sql(a, b)


@register("sim_cosine_topk", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
p AS (SELECT v AS pv FROM e WHERE vec_id = 0)
SELECT vec_id, round(c, 6) AS cosine_sim FROM (
  SELECT e.vec_id, {_cos_sql('e.v', 'p.pv')} AS c
  FROM e, p WHERE e.vec_id <> 0
) t ORDER BY c DESC, vec_id LIMIT 20
""")
def _sim1(spark, sf_dir):
    from .operators.similarity import brute_force_topk
    return brute_force_topk(_t(spark, sf_dir, "embeddings"), probe_id=0, k=20)


@register("sim_neardup_pairs", f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
SELECT id_a, id_b, round(c, 6) AS cosine_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_cos_sql('a.v', 'b.v')} AS c
  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
) t WHERE c >= 0.3
""")
def _sim2(spark, sf_dir):
    from .operators.similarity import cosine_neardup_pairs
    return cosine_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.3)


@register("sim_ivf_topk", f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT id AS cid, v AS cv FROM e WHERE id < 16),
assign AS (
  SELECT id, v, cid AS centroid FROM (
    SELECT e.id, e.v, c.cid,
           row_number() OVER (PARTITION BY e.id
                              ORDER BY {_cos_sql('e.v', 'c.cv')} DESC, c.cid) AS rn
    FROM e CROSS JOIN c) t
  WHERE rn = 1
), p AS (SELECT v AS pv, centroid AS pc FROM assign WHERE id = 0)
SELECT id AS vec_id, round(c2, 6) AS cosine_sim FROM (
  SELECT a.id, {_cos_sql('a.v', 'p.pv')} AS c2
  FROM assign a, p WHERE a.centroid = p.pc AND a.id <> 0) t
ORDER BY c2 DESC, id LIMIT 20
""")
def _sim3(spark, sf_dir):
    from .operators.similarity import ivf_topk
    return ivf_topk(_t(spark, sf_dir, "embeddings"), probe_id=0, k=20,
                    n_centroids=16)


def _srp_oracle_sql(num_planes: int = 6, dim: int = 64) -> str:
    from .operators.similarity import srp_planes
    planes = srp_planes(num_planes, dim)
    bucket = " + ".join(
        f"(CASE WHEN list_dot_product(v, {plane!r}) > 0 "
        f"THEN CAST({1 << p} AS BIGINT) ELSE 0 END)"
        for p, plane in enumerate(planes))
    return f"""
WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings),
sigs AS (SELECT id, v, {bucket} AS bucket FROM e),
p AS (SELECT v AS pv, bucket AS pb FROM sigs WHERE id = 0)
SELECT id AS vec_id, round(c, 6) AS cosine_sim FROM (
  SELECT s.id, {_cos_sql('s.v', 'p.pv')} AS c
  FROM sigs s, p WHERE s.bucket = p.pb AND s.id <> 0) t
ORDER BY c DESC, id LIMIT 20
"""


@register("sim_lsh_bucket_topk", _srp_oracle_sql())
def _sim4(spark, sf_dir):
    from .operators.similarity import srp_bucket_topk
    return srp_bucket_topk(_t(spark, sf_dir, "embeddings"), probe_id=0, k=20,
                           num_planes=6)


# --------------------------------------------------------------------------
# Streaming window aggregates (streaming/windows.py) — oracle-checked in
# their batch form; stream-mode parity is pinned in tests/test_streaming.py
# --------------------------------------------------------------------------

@register("stream_tumbling_stats", """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events, round(sum(value), 6) AS value_sum
FROM events GROUP BY 1, 2
""")
def _w1(spark, sf_dir):
    from .streaming.windows import tumbling_event_stats
    return tumbling_event_stats(_t(spark, sf_dir, "events"))


@register("stream_sliding_counts", """
WITH b AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS b30, event_type FROM events
), slots AS (
  SELECT b30 AS window_start, event_type FROM b
  UNION ALL
  SELECT b30 - INTERVAL '30 minutes' AS window_start, event_type FROM b
)
SELECT window_start, event_type, count(*) AS n_events
FROM slots GROUP BY 1, 2
""")
def _w2(spark, sf_dir):
    # width 2× slide → every event lands in exactly two windows, which is
    # what the UNION ALL oracle enumerates.
    from .streaming.windows import sliding_event_stats
    return sliding_event_stats(_t(spark, sf_dir, "events"))


@register("stream_session_stats", """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER uw IS NULL
                OR ts - lag(ts) OVER uw >= INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW uw AS (PARTITION BY user_id ORDER BY ts)
), sessions AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts) AS first_event, max(ts) AS last_event,
       count(*) AS n_events, round(sum(value), 6) AS value_sum
FROM sessions GROUP BY user_id, sid
""")
def _w3(spark, sf_dir):
    # Spark session_window closes at gap ≥ 30 min (the window spans
    # [start, last+gap)), hence the >= in the gaps-and-islands oracle.
    from .streaming.windows import session_event_stats
    return session_event_stats(_t(spark, sf_dir, "events"))


# --------------------------------------------------------------------------
# Text analysis over documents (operators/textstats.py) — greenfield
# training-data-pipeline layer (quality / lang-ID / tokens / fingerprints)
# --------------------------------------------------------------------------

def _stopword_in_list() -> str:
    from .operators.textstats import STOPWORDS
    return ", ".join(f"'{s}'" for s in STOPWORDS)


@register("text_quality_signals", f"""
WITH base AS (
  SELECT doc_id, text, string_split(lower(text), ' ') AS w FROM documents
)
SELECT doc_id,
  length(text) AS n_chars,
  len(w) AS n_words,
  round(list_sum(list_transform(w, x -> length(x)))::DOUBLE / len(w), 6)
    AS avg_word_len,
  round((length(text) -
         length(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g')))::DOUBLE
        / length(text), 6) AS punct_ratio,
  round(len(list_filter(w, x -> x IN ({_stopword_in_list()})))::DOUBLE
        / len(w), 6) AS stopword_ratio,
  round(len(list_distinct(w))::DOUBLE / len(w), 6) AS uniq_word_ratio
FROM base
""")
def _tx1(spark, sf_dir):
    from .operators.textstats import quality_signals
    return quality_signals(_t(spark, sf_dir, "documents"))


@register("text_token_counts", r"""
SELECT doc_id,
  len(string_split(lower(text), ' ')) AS ws_tokens,
  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
    AS bpe_tokens
FROM documents
""")
def _tx2(spark, sf_dir):
    from .operators.textstats import token_counts
    return token_counts(_t(spark, sf_dir, "documents"))


def _lang_id_oracle_sql() -> str:
    from .operators.textstats import LANG_MARKERS
    score_cols = ",\n  ".join(
        "len(list_filter(w, x -> x IN ({vals}))) AS score_{lang}".format(
            vals=", ".join(f"'{m}'" for m in marks), lang=lang)
        for lang, marks in LANG_MARKERS.items())
    best = "greatest(" + ", ".join(f"score_{l}" for l in LANG_MARKERS) + ")"
    pred = "'und'"
    for lang in reversed(list(LANG_MARKERS)):
        pred = (f"CASE WHEN best > 0 AND score_{lang} = best "
                f"THEN '{lang}' ELSE {pred} END")
    return f"""
WITH base AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS w FROM documents
), scored AS (
  SELECT doc_id, lang AS labeled_lang,
  {score_cols}
  FROM base
), withbest AS (
  SELECT *, {best} AS best FROM scored
)
SELECT doc_id, labeled_lang,
  {', '.join(f'score_{l}' for l in LANG_MARKERS)},
  {pred} AS predicted_lang
FROM withbest
"""


@register("text_language_id", _lang_id_oracle_sql())
def _tx3(spark, sf_dir):
    from .operators.textstats import language_id
    return language_id(_t(spark, sf_dir, "documents"))


def _fingerprint_oracle_sql() -> str:
    from .functions.hashes import md5_hash64_sql
    sh = shingles_sql("text", 5).replace("list_distinct(", "(", 1)
    h = md5_hash64_sql("x")
    return f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN len(string_split(lower(text), ' ')) >= 5
              THEN {sh} ELSE [] END AS sh
  FROM documents
), hashed AS (
  SELECT doc_id, list_sort(list_transform(sh, x -> {h})) AS hs FROM base
)
SELECT doc_id, hs[1] AS fingerprint64, hs[1:4] AS sketch FROM hashed
"""


@register("text_fingerprints", _fingerprint_oracle_sql())
def _tx4(spark, sf_dir):
    from .operators.textstats import fingerprints
    return fingerprints(_t(spark, sf_dir, "documents"))


def _corpus_profile_oracle_sql() -> str:
    lid = _lang_id_oracle_sql()
    return f"""
WITH lid AS ({lid}),
q AS ({REGISTRY['text_quality_signals'][1]})
SELECT lid.predicted_lang, count(*) AS n_docs,
  round(avg(q.n_words), 6) AS avg_n_words,
  round(avg(q.stopword_ratio), 6) AS avg_stopword_ratio,
  round(avg(q.uniq_word_ratio), 6) AS avg_uniq_word_ratio
FROM q JOIN lid USING (doc_id)
GROUP BY lid.predicted_lang
"""


@register("text_corpus_language_profile", _corpus_profile_oracle_sql())
def _tx5(spark, sf_dir):
    from .operators.textstats import corpus_language_profile
    return corpus_language_profile(_t(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# General analytic surface beyond the reference (rollup, per-group top-k,
# approximate distinct) — the ops an analytics engine is expected to have
# even though the reference never issues them (SURVEY.md §2 honesty note).
# --------------------------------------------------------------------------

@register("agg_rollup_events", """
SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       count(*) AS n_events, round(sum(value), 6) AS value_sum,
       CAST(grouping(event_type) AS INT) AS g_type,
       CAST(grouping(date_trunc('day', ts)) AS INT) AS g_day
FROM events
GROUP BY ROLLUP (event_type, date_trunc('day', ts))
""")
def _roll1(spark, sf_dir):
    # ROLLUP is one shuffle with grouping-set expansion map-side — the
    # hierarchy rollup (type, day) → (type) → () in a single pass.
    e = _t(spark, sf_dir, "events").withColumn("day", F.date_trunc("day", "ts"))
    return (e.rollup("event_type", "day")
            .agg(F.count("*").alias("n_events"),
                 F.round(F.sum("value"), 6).alias("value_sum"),
                 F.grouping("event_type").cast("int").alias("g_type"),
                 F.grouping("day").cast("int").alias("g_day")))


@register("topk_events_per_user", """
SELECT user_id, event_id, value, rnk FROM (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rnk
  FROM events
) WHERE rnk <= 3
""")
def _topk1(spark, sf_dir):
    # per-group top-k: rank window + filter — Spark pushes the k-limit
    # into the sort via WindowGroupLimit (no full per-group sort at scale)
    from pyspark.sql import Window
    w = (Window.partitionBy("user_id")
         .orderBy(F.desc("value"), F.asc("event_id")))
    return (_t(spark, sf_dir, "events")
            .select("user_id", "event_id", "value",
                    F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= 3))


# Approximate distinct (HLL++): sketch values are engine-specific, so no
# value-level oracle — the driver records rows-only; the ±5% error bound
# vs exact is pinned in tests/test_analytics.py.
@register("approx_distinct_users", None)
def _apx1(spark, sf_dir):
    return (_t(spark, sf_dir, "events")
            .groupBy("event_type")
            .agg(F.approx_count_distinct("user_id", rsd=0.02)
                  .alias("approx_users"),
                 F.count("*").alias("n_events")))


# TPC-H q1/q3/q6 over the driver's tables: standard engine-generality
# probes (agg-heavy scan, join+agg+top-k, selective filter-agg) so the
# bench is comparable to published numbers. Not reference parity —
# general analytic capability.

@register("tpch_q1", """
SELECT l_returnflag, l_linestatus,
  round(sum(l_quantity), 6) AS sum_qty,
  round(sum(l_extendedprice), 6) AS sum_base_price,
  round(sum(l_extendedprice * (1 - l_discount)), 6) AS sum_disc_price,
  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)
    AS sum_charge,
  round(avg(l_quantity), 6) AS avg_qty,
  round(avg(l_extendedprice), 6) AS avg_price,
  round(avg(l_discount), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def _q1(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.filter(F.col("l_shipdate") <= F.lit("2001-09-02 00:00:00")
                      .cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 6).alias("sum_base_price"),
                 F.round(F.sum(disc), 6).alias("sum_disc_price"),
                 F.round(F.sum(disc * (1 + F.col("l_tax"))), 6)
                  .alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order")))


@register("tpch_q3", """
SELECT l.l_orderkey,
  round(sum(l.l_extendedprice * (1 - l.l_discount)), 6) AS revenue,
  o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
""")
def _q3(spark, sf_dir):
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    c = (_t(spark, sf_dir, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    o = (_t(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") < cutoff)
         .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
    li = (_t(spark, sf_dir, "lineitem")
          .filter(F.col("l_shipdate") > cutoff)
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.round(F.sum(F.col("l_extendedprice") *
                               (1 - F.col("l_discount"))), 6).alias("revenue"))
            .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
            .limit(10)
            .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority"))


@register("tpch_q6", """
SELECT round(sum(l_extendedprice * l_discount), 6) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""")
def _q6(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")) &
        (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp")) &
        (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07) &
        (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 6)
             .alias("revenue")))


# As-of join (operators/asof.py): enrich every event with the user's
# most recent at-or-before purchase — oracle is DuckDB's NATIVE ASOF
# JOIN, pinning the merge-scan semantics (ties: right-at-timestamp wins).
@register("asof_last_purchase", """
WITH p AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, e.ts, e.event_type, e.value,
       p.ts AS asof_ts, p.value AS asof_value
FROM events e ASOF LEFT JOIN p
  ON e.user_id = p.user_id AND e.ts >= p.ts
""")
def _asof1(spark, sf_dir):
    from .operators.asof import asof_join
    events = _t(spark, sf_dir, "events")
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", "ts", "value"))
    out = asof_join(events, purchases, "user_id", "ts", "ts", ["value"])
    return out.select("event_id", "user_id", "ts", "event_type", "value",
                      "asof_ts", "asof_value")


# Bucketed range join (operators/rangejoin.py): events within one hour
# AFTER the same user's purchase — the oracle is the plain inequality
# join; the Spark plan must be a hash join on (user, bucket), never a
# nested-loop (pinned in tests/test_rangejoin.py).
@register("range_join_post_purchase", """
WITH p AS (
  SELECT user_id, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       p.p_ts, p.p_value
FROM events e JOIN p
  ON e.user_id = p.user_id
 AND e.ts >= p.p_ts AND e.ts <= p.p_ts + INTERVAL '1 hour'
""")
def _range1(spark, sf_dir):
    from .operators.rangejoin import range_join
    events = _t(spark, sf_dir, "events")
    purchases = (events.filter(F.col("event_type") == "purchase")
                 .select("user_id", F.col("ts").alias("p_ts"),
                         F.col("value").alias("p_value"))
                 .withColumn("p_end", F.col("p_ts") + F.expr("INTERVAL 1 HOUR")))
    out = range_join(events, purchases, "user_id", "ts", "p_ts", "p_end")
    return out.select("event_id", "user_id", "ts", "event_type",
                      "p_ts", "p_value")


# Skew-safe salted aggregate (operators/skew.py): 3-value grouping key
# over the biggest table — the hot-key shape where one reduce task would
# otherwise absorb a third of the table. Values must equal the plain
# GROUP BY (salting is a physical rewrite, not a semantic one).
@register("skew_salted_agg", """
SELECT l_returnflag,
       round(sum(l_quantity), 6) AS sum_qty,
       count(*) AS n_rows,
       max(l_extendedprice) AS max_price
FROM lineitem GROUP BY l_returnflag
""")
def _skew1(spark, sf_dir):
    from .operators.skew import salted_aggregate
    out = salted_aggregate(
        _t(spark, sf_dir, "lineitem"), "l_returnflag",
        {"sum_qty": ("sum", "l_quantity"),
         "n_rows": ("count", "l_orderkey"),
         "max_price": ("max", "l_extendedprice")},
        buckets=16, salt_from="l_orderkey")
    return out.withColumn("sum_qty", F.round("sum_qty", 6))


# Stateful streaming gate (streaming/stateful.py) — genuinely
# non-SQL-expressible (per-entity state store across micro-batches), so
# registered WITHOUT an oracle: the driver records the rows-only check.
# Cross-batch state semantics are pinned in tests/test_stateful_stream.py.
@register("stream_stateful_incremental_gate", None)
def _wstate(spark, sf_dir):
    import tempfile
    import uuid
    from .streaming.stateful import EVENT_SCHEMA, incremental_dump_stream

    # file streaming source needs a DIRECTORY; glob-filter to the events
    # table and apply the same ns→us timestamp conversion as load_table
    raw_schema = ("event_id long, ts long, user_id long, "
                  "event_type string, value double, props string")
    src = (spark.readStream.schema(raw_schema)
           .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
           .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000"))))
    gated = incremental_dump_stream(
        src.select(*[f.name for f in EVENT_SCHEMA.fields]))
    name = f"gate_{uuid.uuid4().hex[:8]}"
    q = (gated.writeStream.format("memory").queryName(name)
         .option("checkpointLocation",
                 tempfile.mkdtemp(prefix="ckpt_gate_"))
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(300)
    return spark.table(name)


# --------------------------------------------------------------------------
# Multimodal columns (operators/multimodal.py) — binary payload + typed
# metadata; decode/feature/resize/frame-sample as Arrow-batched Pandas UDF
# pipelines over a deterministic synthetic payload (utf-8 text bytes, pure
# ASCII, so DuckDB recomputes every byte-level result from characters).
# --------------------------------------------------------------------------

_MEDIA_CTE = """
m AS (
  SELECT doc_id AS media_id,
         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
         text,
         length(text) AS n,
         regexp_extract_all(text, '.') AS chars
  FROM documents
)"""


def _media(spark, sf_dir):
    from .operators.multimodal import media_table
    return media_table(_t(spark, sf_dir, "documents"))


@register("mm_decode_stats", f"""
WITH {_MEDIA_CTE}
SELECT media_id, n AS n_bytes,
       list_sum(list_transform(chars, c -> ord(c))) % 2147483648 AS checksum
FROM m
""")
def _mm1(spark, sf_dir):
    from .operators.multimodal import decode_stats
    return decode_stats(_media(spark, sf_dir))


@register("mm_byte_histogram", f"""
WITH {_MEDIA_CTE}
SELECT media_id,
       list_transform(generate_series(0, 15), b ->
         round(len(list_filter(chars, c -> ord(c) // 16 = b))::DOUBLE / n, 6))
         AS features
FROM m
""")
def _mm2(spark, sf_dir):
    from .operators.multimodal import byte_histogram_features
    return byte_histogram_features(_media(spark, sf_dir))


@register("mm_frame_sample", f"""
WITH {_MEDIA_CTE},
frames AS (
  SELECT media_id, text,
         unnest(generate_series(0, n // 16 - 1, 4)) AS frame_idx
  FROM m
)
SELECT media_id, frame_idx,
       CAST(substr(text, frame_idx * 16 + 1, 16) AS BLOB) AS frame
FROM frames
""")
def _mm3(spark, sf_dir):
    from .operators.multimodal import frame_sample
    return frame_sample(_media(spark, sf_dir), every_n=4, frame_bytes=16)


@register("mm_resize", f"""
WITH {_MEDIA_CTE}
SELECT media_id,
       CAST(array_to_string(list_transform(generate_series(0, 767),
              i -> substr(text, ((i * n) // 768 % n) + 1, 1)), '') AS BLOB)
         AS content,
       32 AS width, 24 AS height
FROM m
""")
def _mm4(spark, sf_dir):
    from .operators.multimodal import resize
    out = resize(_media(spark, sf_dir), target_w=32, target_h=24)
    return out.select("media_id", "content",
                      F.col("meta.width").alias("width"),
                      F.col("meta.height").alias("height"))


@register("mm_meta_summary", f"""
WITH {_MEDIA_CTE}
SELECT kind, count(*) AS n_assets,
       max(n % 64 + 16) AS max_width,
       round(avg(n * 10), 6) AS avg_duration_ms
FROM m GROUP BY kind
""")
def _mm5(spark, sf_dir):
    from .operators.multimodal import media_meta_summary
    return media_meta_summary(_media(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
