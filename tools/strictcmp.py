"""Strict cross-engine result comparison — the shared core of
``bitwise_audit.py`` and ``flake_fence.py``.

The driver's correctness gate hashes normalized cell values; the local
``check_correctness.py`` normalizes floats with ``%.9g``, which MASKS
last-ulp cross-engine differences — the r9/r10 lesson is that queries
can pass every isolated ``%.9g`` re-run and still hash-red under the
driver (``evt_bot_detection``'s median differed at the 11th significant
digit: ``32947.01539`` vs ``32947.015389``). This module compares
floats BITWISE (exact IEEE-754 payload), which is strictly harsher than
any reasonable driver normalization: a query that is bitwise-identical
across engines cannot fail ANY value-hash protocol, whatever the
driver's float formatting or its DuckDB/Spark point versions do at
rounding half-boundaries.

Decimals are compared exactly (normalized, so scale-width differences
between Spark's decimal(28,6) sums and DuckDB's decimal(38,6) don't
false-positive); everything else by ``str``.
"""

from __future__ import annotations

import hashlib
import math
import struct
from decimal import Decimal


def strict_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return struct.pack("<d", v).hex()
    if isinstance(v, Decimal):
        return str(v.normalize())
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(strict_cell(x) for x in v) + "]"
    return str(v)


def strict_lines(rows, colnames) -> list[str]:
    """Order-insensitive canonical form: cells joined in column-name
    order, rows sorted."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted("\x1f".join(strict_cell(r[i]) for i in order)
                  for r in rows)


def strict_hash(rows, colnames) -> str:
    h = hashlib.sha256()
    for line in strict_lines(rows, colnames):
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()[:16]


def first_diff(lines_a, lines_b) -> tuple[str, str] | None:
    for a, b in zip(lines_a, lines_b):
        if a != b:
            return a, b
    if len(lines_a) != len(lines_b):
        return (f"<{len(lines_a)} rows>", f"<{len(lines_b)} rows>")
    return None


def diff_cells(lines_a, lines_b, colnames) -> list[str]:
    """Column names (sorted order) of cells that differ on the first
    differing row pair — for audit reporting."""
    order = sorted(colnames)
    d = first_diff(lines_a, lines_b)
    if d is None:
        return []
    ca, cb = d[0].split("\x1f"), d[1].split("\x1f")
    if len(ca) != len(order) or len(cb) != len(order):
        return ["<row-count>"]
    return [order[i] for i in range(len(order)) if ca[i] != cb[i]]


def connect_oracle(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con
