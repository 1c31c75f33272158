"""Derived-column expressions (reference operators P2–P8).

All pure ``pyspark.sql.functions`` Column expressions — JVM-side, inside
whole-stage codegen, no Python UDFs. Reference citations per function.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column
from pyspark.sql import functions as F


def dump_id_expr(per_batch: bool = True) -> Column:
    """P2 — lineage UUID tagged onto every emitted row.

    The reference mints one uuid4 per serializer *instance*, i.e. one per
    dump batch (``event_sink_clickhouse/serializers.py:25-27``); nested
    block rows inherit the parent's (``sinks/base_sink.py:184-203``). We
    default to that per-batch semantics (a single literal resolved at plan
    build time); ``per_batch=False`` mints one per row via ``uuid()``.
    """
    if per_batch:
        return F.lit(str(uuid.uuid4()))
    return F.expr("uuid()")


def deterministic_dump_id(key: Column) -> Column:
    """Oracle-friendly stand-in for P2: a uuid-shaped string derived from
    the row key, so correctness checks can cover the dump_id plumbing
    without nondeterminism. Layout matches uuid hex grouping 8-4-4-4-12."""
    h = F.md5(key.cast("string"))
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8), F.substring(h, 9, 4), F.substring(h, 13, 4),
        F.substring(h, 17, 4), F.substring(h, 21, 12),
    )


def deterministic_dump_id_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`deterministic_dump_id`."""
    h = f"md5(CAST({expr} AS VARCHAR))"
    return (f"concat_ws('-', substr({h},1,8), substr({h},9,4), substr({h},13,4), "
            f"substr({h},17,4), substr({h},21,12))")


def ingest_timestamp() -> Column:
    """P3 — ``time_last_dumped = now()`` (``serializers.py:29-31``)."""
    return F.current_timestamp()


def json_pack(*cols: Column | str, **named: Column) -> Column:
    """P4 — pack "extra" fields into a JSON-string column, as the reference
    does for ``course_data_json`` (``serializers.py:131-149``) and
    ``xblock_data_json`` (``sinks/course_published.py:105-112``).

    Typed inner schema → ``to_json(struct(...))``; nulls are kept so the
    key set is stable across rows (the reference always emits every key).
    """
    fields = [F.col(c) if isinstance(c, str) else c for c in cols]
    fields += [c.alias(name) for name, c in named.items()]
    return F.to_json(F.struct(*fields), {"ignoreNullFields": "false"})


def bool_flag(col: Column) -> Column:
    """P5 — bool → 0/1 int flag (``sinks/course_published.py:109-111``)."""
    return F.when(col, 1).otherwise(0).cast("int")


def normalize_apostrophes(col: Column) -> Column:
    """P6 — typographic→ASCII apostrophe on display names
    (``sinks/course_published.py:119``)."""
    return F.translate(col, "’", "'")


def strip_branch_and_version(location: Column) -> Column:
    """P7 — canonical block key: drop ``@branch+...``/``@version`` decorations
    (``sinks/course_published.py:129-137``). The reference round-trips
    through ``course_key.make_usage_key``; textually that removes any
    ``+branch@...`` and ``+version@...`` segments from the serialized key.
    """
    return F.regexp_replace(location, r"\+(branch|version)@[^+]*", "")


def member_flag(col: Column, members: tuple[str, ...]) -> Column:
    """P8 — set-membership 0/1 flag, e.g. ``detached`` block types
    (``sinks/course_published.py:109``, ``utils.py:50-59``)."""
    return F.col(col).isin(list(members)).cast("int") if isinstance(col, str) \
        else col.isin(list(members)).cast("int")


# Block types whose subtree is excluded from the course nav tree
# (reference ``event_sink_clickhouse/utils.py:50-59`` pulls these from the
# xblock registry; the test fixture uses course_info/static_tab/about).
DETACHED_XBLOCK_TYPES = ("course_info", "static_tab", "about")
