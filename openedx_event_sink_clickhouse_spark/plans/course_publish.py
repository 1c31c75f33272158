"""EP1 — the course-publish pipeline (reference flagship path).

Reference flow (``sinks/course_published.py``): COURSE_PUBLISHED signal →
serialize the course overview row → walk the modulestore block tree,
assign hierarchy ordinals, JSON-pack block metadata, dedup by canonical
location → bulk-insert ``course_blocks`` with the parent dump's
``dump_id``/``time_last_dumped``.

Here the whole flow is one declarative plan over a blocks DataFrame:

    tree_ordinals (T1, windows)  →  projections P4-P8  →
    last_wins_dedup (T2, max_by) →  fan-out metadata (T3)

The input contract is a DataFrame of blocks in depth-first pre-order:
(course_key, org, location, display_name, block_type, graded,
completion_mode, order, edited_on) — ``order`` is the 1-based traversal
index the modulestore yields (``course_published.py:60-66``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.derivations import (
    DETACHED_XBLOCK_TYPES,
    bool_flag,
    member_flag,
    normalize_apostrophes,
    strip_branch_and_version,
)
from ..operators.tree import fan_out, last_wins_dedup, tree_ordinals


def serialize_course_overviews(overviews: DataFrame, dump_id: Column,
                               time_last_dumped: Column) -> DataFrame:
    """Produce ``course_overviews`` sink rows (FIXTURES.md §1).

    Mirrors ``CourseOverviewSerializer`` (``serializers.py:103-153``):
    projection + rename (P1: ``start``→``course_start``, ``end``→
    ``course_end``, ``id``→``course_key``), ten "extra" fields JSON-packed
    into ``course_data_json`` (P4, key order preserved), dump metadata
    appended (P2/P3). Input contract: one row per course with the model's
    source column names.
    """
    course_data_json = F.to_json(F.struct(
        F.col("advertised_start"),
        F.col("announcement"),
        F.col("lowest_passing_grade").cast("double").alias("lowest_passing_grade"),
        F.col("invitation_only"),
        F.col("max_student_enrollments_allowed"),
        F.col("effort"),
        F.col("enable_proctored_exams"),
        F.col("entrance_exam_enabled"),
        F.col("external_id"),
        F.col("language"),
    ), {"ignoreNullFields": "false"})
    return overviews.select(
        F.col("org"),
        F.col("id").cast("string").alias("course_key"),
        F.col("display_name"),
        F.col("start").alias("course_start"),
        F.col("end").alias("course_end"),
        F.col("enrollment_start"),
        F.col("enrollment_end"),
        F.col("self_paced"),
        course_data_json.alias("course_data_json"),
        F.col("created"),
        F.col("modified"),
        dump_id.alias("dump_id"),
        time_last_dumped.alias("time_last_dumped"),
    )


def serialize_course_blocks(blocks: DataFrame, dump_id: Column,
                            time_last_dumped: Column,
                            detached_types: tuple[str, ...] = DETACHED_XBLOCK_TYPES,
                            ) -> DataFrame:
    """Produce the ``course_blocks`` sink rows (FIXTURES.md §2) from a
    depth-ordered blocks DataFrame.

    Mirrors ``XBlockSink.serialize_item``/``serialize_xblock``
    (``course_published.py:47-127``): ordinals stamped on every row, JSON
    key order (course, run, block_type, detached, graded, completion_mode,
    section, subsection, unit) preserved, later duplicate locations win.
    """
    with_ordinals = tree_ordinals(blocks)

    # course-v1:ORG+COURSE+RUN → course / run (the reference reads these
    # off the typed CourseKey, course_published.py:106-107).
    key_body = F.regexp_replace(F.col("course_key"), r"^[^:]*:", "")
    course = F.split(key_body, r"\+").getItem(1)
    run = F.split(key_body, r"\+").getItem(2)

    xblock_json = F.to_json(F.struct(
        course.alias("course"),
        run.alias("run"),
        F.col("block_type").alias("block_type"),
        member_flag(F.col("block_type"), detached_types).alias("detached"),
        bool_flag(F.coalesce(F.col("graded"), F.lit(False))).alias("graded"),
        F.coalesce(F.col("completion_mode"), F.lit("unknown"))
         .alias("completion_mode"),
        F.col("section"), F.col("subsection"), F.col("unit"),
    ), {"ignoreNullFields": "false"})

    serialized = with_ordinals.select(
        F.col("org"),
        F.col("course_key"),
        strip_branch_and_version(F.col("location")).alias("location"),
        normalize_apostrophes(F.col("display_name")).alias("display_name"),
        xblock_json.alias("xblock_data_json"),
        F.col("order"),
        # str(edited_on) at the wire edge (course_published.py:122)
        F.col("edited_on").cast("string").alias("edited_on"),
        dump_id.alias("dump_id"),
        time_last_dumped.alias("time_last_dumped"),
    )
    # T2: duplicate canonical locations — later traversal index wins
    # (course_published.py:90-94 dict overwrite). Reselect to the sink CSV
    # column order (course_published.py:115-125) after the dedup agg.
    deduped = last_wins_dedup(serialized, ["course_key", "location"], "order")
    return deduped.select("org", "course_key", "location", "display_name",
                          "xblock_data_json", "order", "edited_on",
                          "dump_id", "time_last_dumped")


def course_publish_pipeline(overviews: DataFrame, blocks: DataFrame,
                            dump_id: Column, time_last_dumped: Column,
                            ) -> tuple[DataFrame, DataFrame]:
    """EP1 end-to-end: one call produces both sink tables for a batch of
    published courses.

    The reference dumps the overview row, then fans out to the nested
    XBlockSink with the SAME dump_id/time_last_dumped
    (``base_sink.py:169-203``, ``course_published.py:39-45``). Here the
    overview side mints the metadata and the block side inherits it by a
    broadcast join on course_key (T3) — so a micro-batch of N courses is
    two writes, not 2·N requests.
    """
    overview_rows = serialize_course_overviews(overviews, dump_id,
                                               time_last_dumped)
    meta = overview_rows.select("course_key", "dump_id", "time_last_dumped")
    serialized = serialize_course_blocks(
        blocks, F.lit(None).cast("string"), F.lit(None).cast("string"),
    ).drop("dump_id", "time_last_dumped")
    block_rows = fan_out(
        meta, serialized, "course_key",
        {"dump_id": "dump_id", "time_last_dumped": "time_last_dumped"},
    ).select("org", "course_key", "location", "display_name",
             "xblock_data_json", "order", "edited_on",
             "dump_id", "time_last_dumped")
    return overview_rows, block_rows
