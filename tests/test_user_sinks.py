"""EP2 user_profile / external_id serializers: exact field-list parity
with the reference (``serializers.py:34-66,69-86``) plus CSV wire goldens
at the sink boundary (mirroring the reference's ``responses``-matcher
tests, ``test_utils/helpers.py:240-289``)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from openedx_event_sink_clickhouse_spark.plans.user_sinks import (
    EXTERNAL_ID_FIELDS,
    USER_PROFILE_FIELDS,
    serialize_external_id,
    serialize_user_profile,
)
from openedx_event_sink_clickhouse_spark.sinks.csv_encode import (
    encode_csv_lines,
)

T = dt.datetime(2023, 9, 1, 12, 0, 0)

PROFILE_SRC_COLS = [
    "id", "user_id", "name", "meta", "courseware", "language", "location",
    "year_of_birth", "gender", "level_of_education", "mailing_address",
    "city", "country", "state", "goals", "bio",
    "profile_image_uploaded_at", "phone_number",
]


def _profile_row(pk=7):
    return (pk, pk, "Jane Doe", '{"k":"v"}', "course.xml", "en", "earth",
            1990, "f", "b", "1 Main St", "Springfield", "US", "IL",
            "learn", "a bio", T, "+1-555-7")


def test_user_profile_field_list_and_join(spark):
    profiles = spark.createDataFrame([_profile_row()], PROFILE_SRC_COLS)
    users = spark.createDataFrame([(7, "jane@example.com")], ["id", "email"])
    out = serialize_user_profile(profiles, users, F.lit("dump-1"), F.lit(T))
    row = out.collect()[0]
    # wire order = UserProfileSerializer Meta.fields (serializers.py:44-66)
    assert list(row.asDict()) == list(USER_PROFILE_FIELDS)
    assert row["email"] == "jane@example.com"  # joined via S7 prefetch
    assert row["dump_id"] == "dump-1" and row["time_last_dumped"] == T


def test_user_profile_missing_user_keeps_row(spark):
    # select_related is a LEFT prefetch at our batch boundary: a profile
    # whose user row is absent still serializes, with NULL email.
    profiles = spark.createDataFrame([_profile_row(8)], PROFILE_SRC_COLS)
    users = spark.createDataFrame([(7, "x@example.com")], ["id", "email"])
    out = serialize_user_profile(profiles, users, F.lit("d"), F.lit(T))
    assert out.collect()[0]["email"] is None


def test_external_id_field_list_and_double_join(spark):
    ext = spark.createDataFrame(
        [("uuid-1", 7, 2)],
        ["external_user_id", "user_id", "external_id_type_id"])
    users = spark.createDataFrame([(7, "jane")], ["id", "username"])
    id_types = spark.createDataFrame([(2, "lti")], ["id", "name"])
    out = serialize_external_id(ext, users, id_types,
                                F.lit("dump-2"), F.lit(T))
    row = out.collect()[0]
    # wire order = UserExternalIDSerializer Meta.fields (serializers.py:79-86)
    assert list(row.asDict()) == list(EXTERNAL_ID_FIELDS)
    assert row["external_id_type"] == "lti"   # type dim .name
    assert row["username"] == "jane"          # user dim
    assert row["user_id"] == 7


def test_user_profile_csv_wire_golden(spark):
    profiles = spark.createDataFrame([_profile_row()], PROFILE_SRC_COLS)
    users = spark.createDataFrame([(7, "jane@example.com")], ["id", "email"])
    out = serialize_user_profile(profiles, users, F.lit("dump-1"), F.lit(T))
    line = encode_csv_lines(out).collect()[0]["csv_line"]
    assert line == (
        '7,7,"Jane Doe","jane@example.com","{""k"":""v""}","course.xml",'
        '"en","earth",1990,"f","b","1 Main St","Springfield","US","IL",'
        '"learn","a bio","2023-09-01 12:00:00+00:00","+1-555-7","dump-1",'
        '"2023-09-01 12:00:00+00:00"')


def test_external_id_csv_wire_golden(spark):
    ext = spark.createDataFrame(
        [("uuid-1", 7, 2)],
        ["external_user_id", "user_id", "external_id_type_id"])
    users = spark.createDataFrame([(7, "jane")], ["id", "username"])
    id_types = spark.createDataFrame([(2, "lti")], ["id", "name"])
    out = serialize_external_id(ext, users, id_types,
                                F.lit("dump-2"), F.lit(T))
    line = encode_csv_lines(out).collect()[0]["csv_line"]
    assert line == ('"uuid-1","lti","jane",7,"dump-2",'
                    '"2023-09-01 12:00:00+00:00"')
