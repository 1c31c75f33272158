"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship incremental-sink query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 (one
callable per operator, ``(spark, sf_dir) -> DataFrame``); ``oracle_sql()``
gives the DuckDB-equivalent SQL for each (column names aligned so the
driver's order-insensitive value-hash comparison is meaningful).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openedx_event_sink_clickhouse_spark.session import tune_session
from openedx_event_sink_clickhouse_spark.sources.tables import load_table
from openedx_event_sink_clickhouse_spark.plans.pipelines import (
    flagship_events_incremental,
)

# Cutoff splitting events into "already dumped" vs "new" for the flagship
# incremental-load scenario (events span 2024-01; mid-month ≈ half).
FLAGSHIP_CUTOFF = "2024-01-05 00:00:00"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    events = load_table(spark, "events", "/root/testdata/sf0.001")
    return flagship_events_incremental(events, FLAGSHIP_CUTOFF)


# --- queries / oracles ----------------------------------------------------

def _q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return flagship_events_incremental(load_table(spark, "events", sf_dir),
                                       FLAGSHIP_CUTOFF)


_FLAGSHIP_ORACLE = f"""
WITH wm AS (
  SELECT user_id AS entity_id, max(ts) AS last_dump
  FROM events WHERE ts < TIMESTAMP '{FLAGSHIP_CUTOFF}'
  GROUP BY user_id
)
SELECT
  e.event_id,
  e.user_id,
  e.event_type,
  e.ts AS modified,
  json_object('event_type', e.event_type, 'value', e.value,
              'props', e.props) AS event_data_json,
  concat_ws('-', substr(md5(CAST(e.event_id AS VARCHAR)),1,8),
                 substr(md5(CAST(e.event_id AS VARCHAR)),9,4),
                 substr(md5(CAST(e.event_id AS VARCHAR)),13,4),
                 substr(md5(CAST(e.event_id AS VARCHAR)),17,4),
                 substr(md5(CAST(e.event_id AS VARCHAR)),21,12)) AS dump_id,
  TIMESTAMP '{FLAGSHIP_CUTOFF}' AS time_last_dumped
FROM events e
LEFT JOIN wm ON e.user_id = wm.entity_id
WHERE wm.last_dump IS NULL OR e.ts > wm.last_dump
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {
        "flagship_incremental_dump": _q_flagship,
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each ``queries()`` entry."""
    return {
        "flagship_incremental_dump": _FLAGSHIP_ORACLE,
    }
