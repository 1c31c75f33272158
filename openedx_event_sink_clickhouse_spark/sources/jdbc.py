"""JDBC database source — parity with the reference's live-ORM reads.

The reference's sinks read Django ORM tables resolved by name from a
settings map (``event_sink_clickhouse/utils.py:10-35`` + model map at
``settings/common.py:26-47``), batched by primary key:
``get_queryset(start_pk)`` is ``objects.filter(pk__gt=start_pk)
.order_by("pk")`` (``sinks/base_sink.py:159-167``). This module is that
read path on Spark: ``spark.read.jdbc`` with

- **predicate pushdown** — the ``pk > start_pk`` gate is a DataFrame
  filter that Catalyst pushes into the remote WHERE clause
  (``PushedFilters`` in the scan), so the database ships only the
  backfill's tail, never the whole table;
- **stride partitioning** — ``partitionColumn/lowerBound/upperBound/
  numPartitions`` split the scan into parallel range queries, one per
  task. The reference pages with LIMIT/OFFSET per Celery task; range
  predicates are the scale-correct equivalent (OFFSET is O(n) server
  work per page, a pk range is an index seek);
- **bounds probe** — when the caller doesn't know the pk range, ONE
  min/max aggregate runs remotely (a 1-row collect — the same
  bounded-model footprint as the IVF centroid collect, never data-sized).

Ordering intentionally does NOT mirror ``order_by("pk")``: the reference
orders so its LIMIT paging is deterministic; range partitioning makes
paging deterministic without a remote sort, and downstream operators
(classify_targets, the sinks) are set-oriented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# name → (database table, pk column): the same name-level indirection as
# the reference's EVENT_SINK_CLICKHOUSE_MODEL_CONFIG settings map
# (settings/common.py:26-47), so pipelines address "user_profile" and
# deployment config decides where that lives.
MODEL_TABLES: dict[str, tuple[str, str]] = {
    "auth_user": ("auth_user", "id"),
    "user_profile": ("auth_userprofile", "id"),
    "course_overviews": ("course_overviews_courseoverview", "id"),
    "external_id": ("external_user_ids_externalid", "id"),
    "custom_course_edx": ("ccx_customcourseforedx", "id"),
}


def jdbc_table(spark: SparkSession, url: str, table: str, pk_col: str,
               *, start_pk=None, num_partitions: int = 8,
               lower_bound=None, upper_bound=None,
               fetchsize: int = 10_000, driver: str | None = None,
               options: dict[str, str] | None = None) -> DataFrame:
    """Read one database table as a partitioned DataFrame.

    ``start_pk`` reproduces the reference's ``pk__gt=start_pk`` resume
    gate as a pushed-down filter. ``lower_bound``/``upper_bound`` skip
    the bounds probe when the caller knows the pk range (the backfill
    CLI records it); otherwise one remote min/max aggregate supplies
    them. Bounds only shape partition strides — rows outside them are
    still read (Spark puts them in the edge partitions), so a stale
    cached range can never drop rows.
    """
    def reader():
        r = (spark.read.format("jdbc")
             .option("url", url)
             .option("fetchsize", str(fetchsize)))
        if driver:
            r = r.option("driver", driver)
        for k, v in (options or {}).items():
            r = r.option(k, v)
        return r

    if lower_bound is None or upper_bound is None:
        # ANSI-quoted pk: Spark's own JDBC writer creates case-preserved
        # (quoted) column names, which an unquoted identifier would
        # resolve to the database's fold case (Derby: 'id' -> ID) and miss.
        qpk = '"' + pk_col.replace('"', '""') + '"'
        probe = (reader()
                 .option("dbtable",
                         f"(SELECT MIN({qpk}) AS mn, MAX({qpk}) AS mx "
                         f"FROM {table}) bounds_probe")
                 .load().collect()[0])
        # positional: unquoted aliases fold to the db's case (Derby: MN)
        lower_bound, upper_bound = probe[0], probe[1]

    r = reader().option("dbtable", table)
    if lower_bound is not None and upper_bound is not None \
            and lower_bound != upper_bound and num_partitions > 1:
        r = (r.option("partitionColumn", pk_col)
             .option("lowerBound", str(lower_bound))
             .option("upperBound", str(upper_bound))
             .option("numPartitions", str(num_partitions)))
    df = r.load()
    if start_pk is not None:
        # pushed into the remote WHERE clause (asserted in tests via
        # PushedFilters) — parity with get_queryset(start_pk)'s pk__gt
        df = df.filter(F.col(pk_col) > F.lit(start_pk))
    return df


def load_model_table(spark: SparkSession, name: str, url: str,
                     **kwargs) -> DataFrame:
    """Name-indirected :func:`jdbc_table` — the reference's
    ``get_model(name)`` (utils.py:10-35) against a live database."""
    if name not in MODEL_TABLES:
        raise KeyError(f"unknown model {name!r}; known: "
                       f"{sorted(MODEL_TABLES)}")
    table, pk = MODEL_TABLES[name]
    return jdbc_table(spark, url, table, pk, **kwargs)
