"""EP1 course-publish pipeline: overview serializer golden row + fan-out
metadata inheritance (reference ``serializers.py:103-153``,
``base_sink.py:169-203``)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.plans.course_publish import (
    course_publish_pipeline,
    serialize_course_overviews,
)

from tests.test_tree import COLUMNS, COURSE_KEY, course_factory_rows

OVERVIEW_COLUMNS = [
    "id", "org", "display_name", "start", "end", "enrollment_start",
    "enrollment_end", "self_paced", "created", "modified",
    "advertised_start", "announcement", "lowest_passing_grade",
    "invitation_only", "max_student_enrollments_allowed", "effort",
    "enable_proctored_exams", "entrance_exam_enabled", "external_id",
    "language",
]

T = dt.datetime(2023, 9, 1, 12, 0, 0)


def _overview_row(course_id=COURSE_KEY):
    return (course_id, "TestOrg", "Test Course", T, T, T, T, False, T, T,
            "2023-10-01", "announced", 0.7, True, 100, "2 hours",
            False, False, "ext-1", "en")


def test_overview_serializer_golden(spark):
    df = spark.createDataFrame([_overview_row()], OVERVIEW_COLUMNS)
    out = serialize_course_overviews(df, F.lit("dump-1"), F.lit(T))
    row = out.collect()[0]
    # field list and order = serializer Meta.fields (serializers.py:115-129)
    assert list(row.asDict()) == [
        "org", "course_key", "display_name", "course_start", "course_end",
        "enrollment_start", "enrollment_end", "self_paced",
        "course_data_json", "created", "modified", "dump_id",
        "time_last_dumped"]
    assert row["course_key"] == COURSE_KEY
    assert row["course_start"] == T and row["self_paced"] is False
    j = json.loads(row["course_data_json"])
    # JSON key order = get_course_data_json (serializers.py:131-149)
    assert list(j) == [
        "advertised_start", "announcement", "lowest_passing_grade",
        "invitation_only", "max_student_enrollments_allowed", "effort",
        "enable_proctored_exams", "entrance_exam_enabled", "external_id",
        "language"]
    assert j["lowest_passing_grade"] == 0.7
    assert j["max_student_enrollments_allowed"] == 100
    assert j["invitation_only"] is True


def test_pipeline_blocks_inherit_overview_dump_metadata(spark):
    overviews = spark.createDataFrame([_overview_row()], OVERVIEW_COLUMNS)
    blocks = spark.createDataFrame(course_factory_rows(), COLUMNS)
    ov, bl = course_publish_pipeline(
        overviews, blocks, F.lit("dump-xyz"), F.lit(T))
    assert ov.count() == 1
    rows = bl.collect()
    assert len(rows) == 37
    assert {r["dump_id"] for r in rows} == {"dump-xyz"}
    assert {r["time_last_dumped"] for r in rows} == {T}
    assert bl.columns == ["org", "course_key", "location", "display_name",
                          "xblock_data_json", "order", "edited_on",
                          "dump_id", "time_last_dumped"]
