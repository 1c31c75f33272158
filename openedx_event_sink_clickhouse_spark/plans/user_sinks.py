"""EP2 — the model post_save sinks: user_profile and external_id.

Reference flow (``signals.py:31-64`` → ``tasks.py:41-59``): a model save
triggers a point lookup with its ``select_related`` prefetch joins, then a
field-for-field serializer projection and a single-row CSV POST. Here the
same serializers are set-oriented: a DataFrame of changed rows goes
through the join + exact field-list projection in one plan, so a batch of
N saves is one broadcast-join pass, not N queries.

Field lists mirror the reference exactly:

- ``serialize_user_profile`` ← ``UserProfileSerializer``
  (``event_sink_clickhouse/serializers.py:34-66``): the profile model's
  columns in Meta.fields order, plus ``email`` pulled from the joined
  ``auth_user`` row (``serializers.py:37``, join declared at
  ``sinks/user_profile_sink.py:18-19``).
- ``serialize_external_id`` ← ``UserExternalIDSerializer``
  (``serializers.py:69-86``): ``external_user_id`` + ``external_id_type``
  (the type dim's ``.name``), ``username`` (the user row), ``user_id``,
  with the double ``select_related`` join declared at
  ``sinks/external_id_sink.py:18-19``.

Both append the shared dump metadata (``serializers.py:25-31``).

Scale posture: auth_user/type dims are small per micro-batch →
``joins.enrich`` broadcasts them; the profile/external_id fact side never
shuffles. Column pruning reaches the dim scans because ``enrich`` projects
the picked columns before the join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.joins import enrich

# Meta.fields of UserProfileSerializer (serializers.py:44-66), in wire
# order. ``email`` is the joined-in column; dump metadata appended last.
USER_PROFILE_FIELDS = (
    "id", "user_id", "name", "email", "meta", "courseware", "language",
    "location", "year_of_birth", "gender", "level_of_education",
    "mailing_address", "city", "country", "state", "goals", "bio",
    "profile_image_uploaded_at", "phone_number",
    "dump_id", "time_last_dumped",
)

# Meta.fields of UserExternalIDSerializer (serializers.py:79-86).
EXTERNAL_ID_FIELDS = (
    "external_user_id", "external_id_type", "username", "user_id",
    "dump_id", "time_last_dumped",
)


def serialize_user_profile(profiles: DataFrame, users: DataFrame,
                           dump_id: Column, time_last_dumped: Column,
                           ) -> DataFrame:
    """``user_profile`` sink rows (FIXTURES.md §3).

    ``profiles`` must carry the model columns named in
    :data:`USER_PROFILE_FIELDS` (minus the derived three); ``users`` must
    carry (``id``, ``email``). The S7 prefetch join pulls ``email`` in via
    a broadcast on ``user_id`` (``user_profile_sink.py:18-19``).
    """
    joined = enrich(profiles, users, "user_id", "id", {"email": "email"})
    cols = [F.col(f) for f in USER_PROFILE_FIELDS[:-2]]
    cols += [dump_id.alias("dump_id"),
             time_last_dumped.alias("time_last_dumped")]
    return joined.select(*cols)


def serialize_external_id(external_ids: DataFrame, users: DataFrame,
                          id_types: DataFrame, dump_id: Column,
                          time_last_dumped: Column) -> DataFrame:
    """``external_id`` sink rows (FIXTURES.md §4).

    ``external_ids`` carries (``external_user_id``, ``user_id``,
    ``external_id_type_id``); ``users`` carries (``id``, ``username``);
    ``id_types`` carries (``id``, ``name``). The S8 double prefetch joins
    pull ``username`` and the type's ``name`` (renamed
    ``external_id_type``) via two broadcasts
    (``external_id_sink.py:18-19``, ``serializers.py:72-73``).
    """
    step1 = enrich(external_ids, users, "user_id", "id",
                   {"username": "username"})
    step2 = enrich(step1, id_types, "external_id_type_id", "id",
                   {"name": "external_id_type"})
    cols = [F.col(f) for f in EXTERNAL_ID_FIELDS[:-2]]
    cols += [dump_id.alias("dump_id"),
             time_last_dumped.alias("time_last_dumped")]
    return step2.select(*cols)
