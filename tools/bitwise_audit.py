"""Bitwise cross-engine audit of every oracle-paired registry query.

For each query: run Spark and the DuckDB oracle at the given sf, and
compare with the BITWISE float protocol (``tools/strictcmp.py``) — a
strictly harsher comparator than the driver's value hash. Any query
reported clean here cannot hash-red under ANY driver float
normalization or engine point-version rounding behavior (for this
data); any query flagged carries a latent cross-engine last-ulp
divergence that a ``%.9g`` comparator masks — the r9/r10 driver-red
class — and must be exactified (integer/decimal arithmetic, no
``round(double)``), not re-run until green.

Usage: python tools/bitwise_audit.py [sf_dir] [query ...]
Writes AUDIT_BITWISE.json at the repo root with per-query status.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from strictcmp import (connect_oracle, diff_cells, first_diff,  # noqa: E402
                       strict_lines)


def main() -> int:
    import __spark_entry__ as entrymod
    from openedx_event_sink_clickhouse_spark.session import get_spark

    args = list(sys.argv[1:])
    sf_dir = (args.pop(0) if args and "/" in args[0]
              else "/root/testdata/sf0.01")
    spark = get_spark("bitwise-audit")
    con = connect_oracle(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args or [n for n in qs if n in oracles]
    report, flagged = {}, 0
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            report[name] = {"status": "error", "error": str(e)[:300]}
            flagged += 1
            print(f"[{i+1}/{len(names)}] ERROR {name}: {str(e)[:120]}")
            continue
        sl = strict_lines(srows, scols)
        ol = strict_lines(orows, ocols)
        d = first_diff(sl, ol)
        if d is None:
            report[name] = {"status": "bitwise_ok", "rows": len(srows),
                            "sec": round(time.time() - t0, 2)}
        else:
            flagged += 1
            cells = diff_cells(sl, ol, scols)
            report[name] = {
                "status": "bitwise_diff", "rows": len(srows),
                "cells": cells, "spark": d[0][:240], "oracle": d[1][:240],
                "sec": round(time.time() - t0, 2)}
            print(f"[{i+1}/{len(names)}] DIFF {name} cols={cells}")
    with open("/root/repo/AUDIT_BITWISE.json", "w") as f:
        json.dump({"sf_dir": sf_dir, "n": len(names), "flagged": flagged,
                   "queries": report}, f, indent=1, sort_keys=True)
    print(f"\n{len(names) - flagged}/{len(names)} bitwise-identical; "
          f"{flagged} flagged -> AUDIT_BITWISE.json")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
