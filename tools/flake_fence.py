"""Flake fence: the full driver window, ONE Spark session, N iterations.

VERDICT r10's process finding: flake "fixes" validated by isolated
re-runs recurred under the driver's full-window protocol (two r9 fixes
re-failed in r10). This fence reproduces driver-fidelity conditions —
all window queries executed back-to-back in a single long-lived session
(shared JVM, shared /tmp caches, accumulated session state, loaded
machine) — and repeats the whole window ``--iters`` times, comparing
BITWISE (``tools/strictcmp.py``):

* spark-vs-oracle each iteration (cross-engine determinism under a
  harsher comparator than the driver's), and
* spark-vs-first-iteration (run-to-run stability: shuffle fetch order,
  task retries, AQE replans — anything nondeterministic in the plan
  shows up as an iteration mismatch).

A flake fix counts as validated ONLY when this fence is green.

Usage: python tools/flake_fence.py [sf_dir] [--iters N] [--window K]
                                   [query ...]
Default: sf0.01, 10 iterations, first 50 registry entries (the driver
window). Writes FENCE.json at the repo root.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from strictcmp import (connect_oracle, first_diff,  # noqa: E402
                       strict_lines)


def main() -> int:
    import __spark_entry__ as entrymod
    from openedx_event_sink_clickhouse_spark.session import get_spark

    args = list(sys.argv[1:])
    iters, window = 10, 50
    if "--iters" in args:
        i = args.index("--iters")
        iters = int(args[i + 1])
        del args[i:i + 2]
    if "--window" in args:
        i = args.index("--window")
        window = int(args[i + 1])
        del args[i:i + 2]
    sf_dir = (args.pop(0) if args and "/" in args[0]
              else "/root/testdata/sf0.01")
    spark = get_spark("flake-fence")
    con = connect_oracle(sf_dir)
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    names = args or list(qs)[:window]

    oracle_lines, baseline, status = {}, {}, {}
    t_start = time.time()
    for it in range(1, iters + 1):
        bad_this_iter = []
        for name in names:
            try:
                sdf = qs[name](spark, sf_dir)
                sl = strict_lines([tuple(r) for r in sdf.collect()],
                                  sdf.columns)
            except Exception as e:  # noqa: BLE001
                status.setdefault(name, []).append(f"err@{it}")
                bad_this_iter.append(f"{name}: ERROR {str(e)[:120]}")
                continue
            if name in oracles and name not in oracle_lines:
                try:
                    res = con.execute(oracles[name])
                    oracle_lines[name] = strict_lines(
                        res.fetchall(), [d[0] for d in res.description])
                except Exception as e:  # noqa: BLE001
                    oracle_lines[name] = None
                    bad_this_iter.append(
                        f"{name}: ORACLE ERROR {str(e)[:120]}")
            ok = True
            ol = oracle_lines.get(name)
            if ol is not None:
                d = first_diff(sl, ol)
                if d is not None:
                    status.setdefault(name, []).append(f"xeng@{it}")
                    bad_this_iter.append(
                        f"{name}: cross-engine diff @it{it}: "
                        f"{d[0][:120]} != {d[1][:120]}")
                    ok = False
            if name not in baseline:
                baseline[name] = sl
            elif sl != baseline[name]:
                status.setdefault(name, []).append(f"unstable@{it}")
                d = first_diff(sl, baseline[name])
                bad_this_iter.append(
                    f"{name}: run-to-run instability @it{it}: "
                    f"{d[0][:120]} != {d[1][:120]}")
                ok = False
            if ok:
                status.setdefault(name, [])
        el = time.time() - t_start
        marker = " ".join(bad_this_iter) if bad_this_iter else "clean"
        print(f"iter {it}/{iters} [{el:.0f}s]: {marker}", flush=True)

    flaky = {n: v for n, v in status.items() if v}
    out = {"sf_dir": sf_dir, "iters": iters, "n_queries": len(names),
           "elapsed_sec": round(time.time() - t_start, 1),
           "flaky": flaky, "green": not flaky,
           "queries": names}
    with open("/root/repo/FENCE.json", "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    if flaky:
        print(f"\nFENCE RED: {len(flaky)} flaky queries -> FENCE.json")
        for n, v in flaky.items():
            print(f"  {n}: {v}")
        return 1
    print(f"\nFENCE GREEN: {len(names)} queries x {iters} iterations "
          f"bitwise-stable ({out['elapsed_sec']}s) -> FENCE.json")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
