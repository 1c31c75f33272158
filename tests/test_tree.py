"""Golden tests for T1/T2/T3 replicating the reference's 37-block course
fixture (``test_utils/helpers.py:197-237``) and its pinned ordinal
assertions (``tests/test_course_published.py:265-362``)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.operators.tree import (
    fan_out,
    last_wins_dedup,
    tree_ordinals,
)
from openedx_event_sink_clickhouse_spark.plans.course_publish import (
    serialize_course_blocks,
)

COURSE_KEY = "course-v1:TestOrg+TestCourse+TestRun"


def course_factory_rows():
    """The reference's course_factory as rows: 1 course, 3 chapters
    (chapters 1 and 2 carry 3 sequentials × 3 verticals), 3 detached,
    3 graded verticals, 3 completion-mode verticals — 37 blocks in
    depth-first pre-order."""
    rows = []

    def add(block_type, name, graded=False, completion_mode="unknown"):
        i = len(rows) + 1
        # branch/version decorations on every location to exercise P7
        loc = (f"block-v1:TestOrg+TestCourse+TestRun+type@{block_type}"
               f"+branch@draft-branch+block@b{i:03d}")
        rows.append((COURSE_KEY, "TestOrg", loc, f"Display name {name}",
                     block_type, graded, completion_mode, i,
                     "2023-09-01 12:00:00"))

    add("course", "top")
    for i in range(3):
        add("chapter", f"Section {i}")
        if i > 0:
            for ii in range(3):
                add("sequential", f"Subsection {ii}")
                for iii in range(3):
                    add("vertical", f"Unit {iii}")
    for i in range(3):
        add("course_info", f"Detached {i}")
    for i in range(3):
        add("vertical", f"Graded {i}", graded=True)
    add("vertical", "Completable", completion_mode="completable")
    add("vertical", "Aggregator", completion_mode="aggregator")
    add("vertical", "Excluded", completion_mode="excluded")
    assert len(rows) == 37
    return rows


COLUMNS = ["course_key", "org", "location", "display_name", "block_type",
           "graded", "completion_mode", "order", "edited_on"]


def _serialized(spark):
    blocks = spark.createDataFrame(course_factory_rows(), COLUMNS)
    out = serialize_course_blocks(
        blocks, F.lit("xyz"), F.lit("2023-09-05"))
    rows = sorted(out.collect(), key=lambda r: r["order"])
    return {r["order"] - 1: r for r in rows}  # index as in reference tests


def test_tree_ordinals_golden(spark):
    by_idx = _serialized(spark)

    def loc(idx, section=0, subsection=0, unit=0):
        j = json.loads(by_idx[idx]["xblock_data_json"])
        assert (j["section"], j["subsection"], j["unit"]) == \
            (section, subsection, unit), f"index {idx}: {j}"

    # pinned at tests/test_course_published.py:300-318
    loc(1, 1)
    loc(2, 2)
    loc(15, 3)
    loc(3, 2, 1)
    loc(7, 2, 2)
    loc(11, 2, 3)
    loc(24, 3, 3)
    loc(4, 2, 1, 1)
    loc(5, 2, 1, 2)
    loc(6, 2, 1, 3)
    loc(10, 2, 2, 3)
    loc(25, 3, 3, 1)
    loc(26, 3, 3, 2)
    loc(27, 3, 3, 3)
    # course row before any chapter
    loc(0, 0, 0, 0)


def test_graded_and_completion_golden(spark):
    by_idx = _serialized(spark)

    def flags(idx, graded=0, completion_mode="unknown"):
        j = json.loads(by_idx[idx]["xblock_data_json"])
        assert j["graded"] == graded
        assert j["completion_mode"] == completion_mode

    # pinned at tests/test_course_published.py:354-362
    for idx in (31, 32, 33):
        flags(idx, graded=1)
    flags(34, 0, "completable")
    flags(35, 0, "aggregator")
    flags(36, 0, "excluded")
    # detached flag (utils.py:50-59 set-membership)
    j = json.loads(by_idx[28]["xblock_data_json"])
    assert j["detached"] == 1 and j["block_type"] == "course_info"


def test_serialized_shape_and_edges(spark):
    by_idx = _serialized(spark)
    row = by_idx[4]
    # P7: branch decoration stripped from the canonical location
    assert "+branch@" not in row["location"]
    assert row["location"].endswith("+block@b005")
    # column order matches the sink CSV contract (course_published.py:115-125)
    assert list(row.asDict()) == [
        "org", "course_key", "location", "display_name", "xblock_data_json",
        "order", "edited_on", "dump_id", "time_last_dumped"]
    j = json.loads(row["xblock_data_json"])
    assert list(j) == ["course", "run", "block_type", "detached", "graded",
                      "completion_mode", "section", "subsection", "unit"]
    assert (j["course"], j["run"]) == ("TestCourse", "TestRun")
    assert row["dump_id"] == "xyz" and row["time_last_dumped"] == "2023-09-05"


def test_last_wins_dedup(spark):
    df = spark.createDataFrame(
        [("c", "locA", 1, "first"), ("c", "locA", 3, "last"),
         ("c", "locB", 2, "only")],
        ["course_key", "location", "order", "payload"])
    out = last_wins_dedup(df, ["course_key", "location"], "order")
    got = {(r["location"], r["payload"]) for r in out.collect()}
    assert got == {("locA", "last"), ("locB", "only")}


def test_fan_out_inherits_parent_metadata(spark):
    parents = spark.createDataFrame(
        [("c1", "dump-1", "t1"), ("c2", "dump-2", "t2")],
        ["course_key", "dump_id", "time_last_dumped"])
    children = spark.createDataFrame(
        [("c1", "b1"), ("c1", "b2"), ("c2", "b3")],
        ["course_key", "block"])
    out = fan_out(parents, children, "course_key",
                  {"dump_id": "dump_id", "time_last_dumped": "time_last_dumped"})
    got = {(r["block"], r["dump_id"]) for r in out.collect()}
    assert got == {("b1", "dump-1"), ("b2", "dump-1"), ("b3", "dump-2")}


def test_tree_ordinals_multicourse_partitioning(spark):
    # counters are per-course: two interleaved courses must not leak
    rows = []
    for ck in ("course-v1:O+A+R", "course-v1:O+B+R"):
        rows += [(ck, "O", f"{ck}-l1", "n", "chapter", False, "unknown", 1, ""),
                 (ck, "O", f"{ck}-l2", "n", "vertical", False, "unknown", 2, "")]
    df = spark.createDataFrame(rows, COLUMNS)
    out = tree_ordinals(df)
    for r in out.collect():
        expected = (1, 0, 0) if r["block_type"] == "chapter" else (1, 0, 1)
        assert (r["section"], r["subsection"], r["unit"]) == expected
