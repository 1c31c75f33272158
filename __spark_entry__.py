"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship incremental-sink query at sf0.001;
``queries()`` exposes every implemented operator from SURVEY.md §2 plus the
LLM-data-pipeline extensions (one callable per operator,
``(spark, sf_dir) -> DataFrame``); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for each, with column names aligned so the driver's
order-insensitive value-hash comparison is meaningful. The registry itself
lives in ``openedx_event_sink_clickhouse_spark/registry.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from openedx_event_sink_clickhouse_spark import registry
from openedx_event_sink_clickhouse_spark.session import tune_session
from openedx_event_sink_clickhouse_spark.sources.tables import load_table
from openedx_event_sink_clickhouse_spark.plans.pipelines import (
    flagship_events_incremental,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    events = load_table(spark, "events", "/root/testdata/sf0.001")
    return flagship_events_incremental(events, registry.FLAGSHIP_CUTOFF)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each ``queries()`` entry."""
    return registry.oracle_sql()
