"""Oracle version-robustness pins — the r12 regression fence for the
r9–r11 driver hash-red class.

The driver's oracle environment is not reproducible here (its duckdb
wheel differs from the pinned 1.0.0; the sandbox mirror serves nothing
newer), so these tests pin the REPRESENTATION properties that make a
result hash version-invariant, rather than re-running under a second
engine version:

- no oracle may emit a HUGEINT/UHUGEINT column (DuckDB's ``sum()``
  over integers): its pandas/Arrow conversion changed across
  duckdb-python versions, which is exactly how six bitwise-green
  queries hash-red under the driver at r9–r11;
- no oracle output may contain -0.0 or non-finite doubles (``x/0``
  double-division semantics flipped NULL→±inf across DuckDB 1.x);
- the comparator itself must be able to SEE those hazards (a
  normalization that collapses NULL/NaN or ±0.0 would mask them).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

SF = "/root/testdata/sf0.001"

FIXED_IN_R12 = {
    "stream_expectations_maintenance": ["n_violations", "n_rows"],
    "dq_expectations": ["n_violations", "n_rows"],
    "cur_data_card": ["n_docs", "total_chars", "total_tokens"],
    "evt_logrank_test": ["n_units_0", "n_units_1", "observed_0"],
    "evt_churn_labels": ["n_events", "n_conversions", "days_active"],
    "evt_sequential_monitoring": ["n_0", "n_1", "conv_0", "conv_1"],
    "profile_orders": ["n_rows", "n_nulls", "n_distinct"],
}


def test_version_audit_is_clean_corpus_wide():
    # Every oracle, run against DuckDB: zero HUGEINT/UHUGEINT/BIT/
    # INTERVAL/DECIMAL output columns, zero LIST/STRUCT/MAP/UNION
    # (nested pandas-conversion surface) output columns, zero -0.0 /
    # non-finite double cells.
    from version_audit import audit

    assert audit(SF) == 0


def test_fixed_queries_pandas_ints_are_int64():
    # The seven r12-fixed queries must reach pandas as int64 counts —
    # the representation that converts identically on every duckdb
    # wheel (HUGEINT became float64 on 1.0-era wheels and object on
    # newer ones, splitting the driver's value hash from Spark's).
    from version_audit import connect_views

    from openedx_event_sink_clickhouse_spark import registry

    con = connect_views(SF)
    oracles = registry.oracle_sql()
    for name, int_cols in FIXED_IN_R12.items():
        df = con.sql(oracles[name]).df()
        for c in int_cols:
            assert str(df[c].dtype) == "int64", (
                f"{name}.{c} reaches pandas as {df[c].dtype}; an int64 "
                "count column is the only duckdb-version-stable form")


@pytest.mark.parametrize("a,b", [
    (0.0, -0.0),                      # signed zero
    (float("nan"), None),             # NaN vs NULL
    (1.0, 1.0 + 2 ** -52),            # last-ulp
])
def test_strict_cell_distinguishes_version_hazards(a, b):
    # The dev-loop comparator must SEE every hazard class this fence
    # exists for; %.9g (retired r12) collapsed all three.
    from strictcmp import strict_cell

    assert strict_cell(a) != strict_cell(b)
